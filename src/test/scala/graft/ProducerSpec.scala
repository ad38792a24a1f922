package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.{BronzeStream, Producer}

/** Producer → topic → checkpointed consumer → partitioned bronze: the
  * full ingestion loop, with deterministic dead-lettering. */
class ProducerSpec extends GraftSuite {

  test("producer flushes feed the checkpointed bronze consumer exactly once") {
    val tmp = Files.createTempDirectory("graft-producer")
    val (topic, dlq, out, cp) =
      (s"$tmp/topic", s"$tmp/dlq", s"$tmp/bronze", s"$tmp/cp")

    // flush 1: ticks [0, 500); tick 0, 97, 194, ... are DLQ-bound
    val (good1, bad1) = Producer.produceBatch(spark, topic, dlq, 0, 500)
    assert(good1 + bad1 === 500)
    assert(bad1 === (0L until 500L).count(_ % Producer.DlqEvery == 0))
    BronzeStream.writeBronzeCheckpointed(spark, topic, out, cp)
    assert(spark.read.parquet(out).count() === good1)

    // flush 2: the consumer restart picks up ONLY the new payloads
    val (good2, bad2) = Producer.produceBatch(spark, topic, dlq, 500, 300)
    BronzeStream.writeBronzeCheckpointed(spark, topic, out, cp)
    val bronze = spark.read.parquet(out)
    assert(bronze.count() === good1 + good2)
    assert(bronze.select(countDistinct("trade_id")).head().getLong(0) === good1 + good2)

    // bronze schema contract holds for produced payloads (JSON size
    // extraction worked: every row has a parsed size)
    assert(bronze.filter(col("size").isNull).count() === 0)

    // the DLQ holds exactly the malformed payloads, with a reason
    val dlqDf = spark.read.parquet(dlq)
    assert(dlqDf.count() === bad1 + bad2)
    assert(dlqDf.filter(col("_dlq_reason").isNull).count() === 0)
    val dlqIds = dlqDf.select("event_id").collect().map(_.getLong(0)).sorted
    assert(dlqIds.toSeq === (0L until 800L).filter(_ % Producer.DlqEvery == 0))
  }

  test("producer output is deterministic: same ticks, same payloads") {
    val a = Producer.syntheticEvents(spark, 100, 50).collect().map(_.toSeq)
    val b = Producer.syntheticEvents(spark, 100, 50).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
