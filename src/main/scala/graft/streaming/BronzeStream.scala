package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.Bronze
import graft.sources.Tables

/** Structured-streaming bronze ingest.
  *
  * Re-expresses the reference's Kafka → bronze streaming writer
  * (`processing/spark_jobs/streaming_bronze_writer.py:120-180`) with a
  * file-source stream over the events parquet: parse/extract → event-time
  * watermark → windowed aggregation → sink. The memory sink in complete
  * mode gives a batch-equivalent result (the driver correctness gate
  * compares it to the same aggregation in SQL).
  *
  * Scale: the aggregation state is |products × open windows| with the
  * watermark bounding open windows; on a cluster the sink would be a
  * partitioned table append with checkpointing (same plan shape).
  */
object BronzeStream {

  private val counter = new AtomicInteger(0)

  /** Stream events → bronze → 5-minute windowed volume per product;
    * runs to completion (availableNow) and returns the settled result. */
  /** Raw event file stream → bronze trade columns (nanos-ts
    * normalized) — the shared preamble of every streaming twin.
    * File stream sources take a directory, so the glob selects just
    * the events file. Watermarks require TIMESTAMP (LTZ); the session
    * is UTC so wall-clock values match the NTZ batch model (twins cast
    * back after windowing). */
  private def bronzeStream(spark: SparkSession, dir: String): DataFrame = {
    val schema = Tables.eventsRawSchema(spark, dir)
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
    val tsCol =
      if (schema("ts").dataType == LongType)
        expr("timestamp_micros(ts div 1000)")
      else col("ts").cast("timestamp")
    Bronze.ingest(raw.withColumn("ts", tsCol))
  }

  /** [[bronzeStream]] plus the silver decimal casts and validity
    * filter — the in-stream staging the candle/flow twins aggregate. */
  private def stagedStream(spark: SparkSession, dir: String): DataFrame =
    bronzeStream(spark, dir)
      .withColumn("price", col("price").cast("decimal(18,8)"))
      .withColumn("size", col("size").cast("decimal(18,8)"))
      .filter(col("price") > 0 && col("size") > 0)

  def windowedVolume(spark: SparkSession, dir: String): DataFrame = {
    val agg = bronzeStream(spark, dir)
      .withWatermark("trade_time", "10 minutes")
      .groupBy(window(col("trade_time"), "5 minutes"), col("product_id"))
      .agg(count(lit(1)).as("n_trades"),
        sum(col("size").cast("decimal(18,8)")).cast("decimal(18,8)")
          .as("volume"))

    val name = s"bronze_stream_${counter.incrementAndGet()}"
    val q = agg.writeStream
      .format("memory")
      .queryName(name)
      .outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(name).select(
      col("window.start").cast("timestamp_ntz").as("window_start"),
      col("window.end").cast("timestamp_ntz").as("window_end"),
      col("product_id"), col("n_trades"), col("volume"))
  }

  /** Streaming 1-minute OHLCV candles — the real-time twin of
    * [[graft.operators.Ohlcv.ohlcv1m]]: the SAME single-aggregation
    * min_by/max_by candle plan, evaluated over event-time windows with
    * watermark-bounded state (state = |products × open windows|).
    * Money columns get the silver decimal casts in-stream so results
    * are bit-identical to the batch candles (equivalence-tested).
    * Complete-mode memory sink for the finite-replay check; a
    * deployment appends closed windows (append mode + watermark) to
    * the candle table. */
  def streamingCandles(spark: SparkSession, dir: String): DataFrame = {
    val trades = stagedStream(spark, dir)
      .withColumn("trade_value",
        (col("price").cast("double") * col("size").cast("double"))
          .cast("decimal(18,8)"))

    val agg = trades
      .withWatermark("trade_time", "10 minutes")
      .groupBy(window(col("trade_time"), "1 minute"), col("product_id"))
      .agg(
        min_by(col("price"), struct(col("trade_time"), col("trade_id"))).as("open"),
        max("price").as("high"),
        min("price").as("low"),
        max_by(col("price"), struct(col("trade_time"), col("trade_id"))).as("close"),
        sum("size").cast("decimal(18,8)").as("volume"),
        count(lit(1)).as("trade_count"),
        graft.functions.Rounding.roundScaled(
          sum("trade_value").cast("double") /
            nullif(sum("size").cast("double"), lit(0.0d)), 8)
          .cast("decimal(18,8)").as("vwap"))

    val name = s"candles_stream_${counter.incrementAndGet()}"
    val q = agg.writeStream
      .format("memory").queryName(name).outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(name).select(
      col("window.start").cast("timestamp_ntz").as("window_start"),
      col("product_id"), col("open"), col("high"), col("low"), col("close"),
      col("volume"), col("trade_count"), col("vwap"))
  }

  /** Real-time order-flow imbalance: the streaming twin of
    * [[graft.operators.Microstructure.flowImbalance]] — same exact
    * decimal side-split sums over event-time minute windows with
    * watermark-bounded state, so the settled stream is bit-identical
    * to the batch rollup (equivalence-tested). */
  def streamingFlowImbalance(spark: SparkSession, dir: String): DataFrame = {
    val agg = stagedStream(spark, dir)
      .withWatermark("trade_time", "10 minutes")
      .groupBy(window(col("trade_time"), "1 minute"), col("product_id"))
      .agg(
        sum(when(col("side") === "buy", col("size")).otherwise(lit(0)))
          .cast("decimal(18,8)").as("buy_volume"),
        sum(when(col("side") === "sell", col("size")).otherwise(lit(0)))
          .cast("decimal(18,8)").as("sell_volume"),
        sum(when(col("side") === "buy", 1L).otherwise(0L)).as("n_buys"),
        sum(when(col("side") === "sell", 1L).otherwise(0L)).as("n_sells"))

    val name = s"flow_stream_${counter.incrementAndGet()}"
    val q = agg.writeStream
      .format("memory").queryName(name).outputMode("complete")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(name).select(
      col("window.start").cast("timestamp_ntz").as("window_start"),
      col("product_id"), col("buy_volume"), col("sell_volume"),
      col("n_buys"), col("n_sells"),
      ((col("buy_volume").cast("double") - col("sell_volume").cast("double")) /
        (col("buy_volume").cast("double") + col("sell_volume").cast("double")))
        .as("imbalance"))
  }

  /** Checkpointed bronze table append — the deployment-shaped sink the
    * reference uses (`streaming_bronze_writer.py:170-180`: checkpointed
    * append to the bronze table): raw event files stream in, the bronze
    * transform applies, rows append to a parquet table with the file
    * source's exactly-once tracking in `checkpointDir`. Restartable:
    * re-invoking after new files land processes ONLY the new files
    * (resume test asserts no duplicates and no loss across restarts).
    * The sink table is laid out `partitionBy(_ingestion_date)` like the
    * reference's bronze, so incremental readers prune — see
    * [[graft.operators.BronzeToSilver.incrementalReadPartitioned]]. */
  def writeBronzeCheckpointed(spark: SparkSession, srcDir: String,
                              outDir: String, checkpointDir: String): Unit = {
    val schema = spark.read.parquet(srcDir).schema
    val raw = spark.readStream.schema(schema).parquet(srcDir)
    val tsCol =
      if (schema("ts").dataType == LongType)
        expr("timestamp_micros(ts div 1000)")
      else col("ts").cast("timestamp")
    val q = Bronze.ingest(raw.withColumn("ts", tsCol))
      .writeStream.format("parquet")
      .partitionBy("_ingestion_date")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Stream-STREAM interval join — the remaining Structured Streaming
    * join mode (the other twins cover windowed aggregation, stateful
    * sessions, and stream-static enrichment): each buy trade pairs
    * with the same product's sell trades from the preceding
    * `windowSec` seconds (the matching-engine / trade-surveillance
    * pairing shape). Watermarks on BOTH sides plus the time-bound
    * join condition let Spark evict join state (each side retains
    * only watermark + interval of history — unbounded-state
    * stream-stream joins don't survive production); the inner join
    * emits pairs as matches arrive, no window close needed. Settled
    * result is bit-identical to the batch join (equivalence-tested). */
  def streamingBuySellPairs(spark: SparkSession, dir: String,
                            windowSec: Int = 3600): DataFrame = {
    val buys = stagedStream(spark, dir)
      .filter(col("side") === "buy")
      .select(col("product_id").as("b_product"),
        col("trade_id").as("buy_id"), col("trade_time").as("b_time"),
        col("price").as("buy_price"))
      .withWatermark("b_time", "10 minutes")
    val sells = stagedStream(spark, dir)
      .filter(col("side") === "sell")
      .select(col("product_id").as("s_product"),
        col("trade_id").as("sell_id"), col("trade_time").as("s_time"),
        col("price").as("sell_price"))
      .withWatermark("s_time", "10 minutes")
    val joined = buys.join(sells, expr(
      s"""b_product = s_product
         |AND s_time >= b_time - interval $windowSec seconds
         |AND s_time <= b_time""".stripMargin))

    val name = s"pairs_stream_${counter.incrementAndGet()}"
    val q = joined.writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.table(name).select(
      col("b_product").as("product_id"), col("buy_id"), col("sell_id"),
      col("b_time").cast("timestamp_ntz").as("buy_time"),
      col("s_time").cast("timestamp_ntz").as("sell_time"),
      (col("buy_price").cast("double") - col("sell_price").cast("double"))
        .as("spread"))
  }

  /** Streaming at-least-once dedup: the redelivered bronze stream
    * deduplicated by trade_id with `dropDuplicatesWithinWatermark` —
    * the streaming twin of the batch silver dedup
    * (`bronze_to_silver.py:96-105`), with state bounded by the
    * watermark instead of an unbounded seen-keys set. */
  def dedupedTrades(spark: SparkSession, dir: String): DataFrame = {
    val bronze = bronzeStream(spark, dir)
    // deterministic at-least-once redelivery, streaming flavor
    val dup = bronze.filter(col("trade_id") % 10 === 0)
      .withColumn("ingested_at", expr("timestampadd(SECOND, 900, ingested_at)"))
      .withColumn("_ingestion_date", to_date(col("ingested_at")))
    val deduped = bronze.unionByName(dup)
      .withWatermark("ingested_at", "1 hour")
      .dropDuplicatesWithinWatermark("trade_id")

    val name = s"bronze_dedup_${counter.incrementAndGet()}"
    val q = deduped.writeStream
      .format("memory").queryName(name).outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }
}
