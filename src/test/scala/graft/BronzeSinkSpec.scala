package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.BronzeStream

/** Checkpointed streaming bronze sink: stop/restart resume semantics. */
class BronzeSinkSpec extends GraftSuite {

  test("checkpointed sink processes each input file exactly once across restarts") {
    val tmp = Files.createTempDirectory("graft-bronze-sink")
    val (src, out, cp) = (s"$tmp/src", s"$tmp/out", s"$tmp/cp")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val half1 = raw.filter(col("event_id") % 2 === 0)
    val half2 = raw.filter(col("event_id") % 2 =!= 0)

    // run 1: only the first half is present
    half1.write.mode("overwrite").parquet(src)
    BronzeStream.writeBronzeCheckpointed(spark, src, out, cp)
    val n1 = spark.read.parquet(out).count()
    assert(n1 === half1.count() && n1 > 0)

    // restart after new files land: ONLY the new files are processed
    half2.write.mode("append").parquet(src)
    BronzeStream.writeBronzeCheckpointed(spark, src, out, cp)
    val after = spark.read.parquet(out)
    assert(after.count() === raw.count())
    assert(after.select(countDistinct("trade_id")).head().getLong(0) === raw.count())

    // restart with nothing new: a no-op, no duplicates
    BronzeStream.writeBronzeCheckpointed(spark, src, out, cp)
    assert(spark.read.parquet(out).count() === raw.count())

    // the sink table is physically partitioned by ingestion date
    val dirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_ingestion_date="))
    assert(dirs.length ===
      after.select("_ingestion_date").distinct().count())
  }

  test("streaming 1-minute candles equal the batch ohlcv_1m exactly") {
    import graft.operators.{Bronze, BronzeToSilver, Ohlcv, Staging}
    import graft.sources.Tables
    val stream = BronzeStream.streamingCandles(spark, sf)
    // batch twin on the SAME input (no redeliveries: unique trade ids
    // make the silver dedup the identity here)
    val batch = Ohlcv.ohlcv1m(Staging.stgTrades(
        BronzeToSilver.transform(Bronze.ingest(Tables.events(spark, sf)))))
      .select("window_start", "product_id", "open", "high", "low", "close",
        "volume", "trade_count", "vwap")
    assert(stream.count() > 0 && stream.count() === batch.count())
    assert(stream.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(stream).count() === 0)
  }
}
