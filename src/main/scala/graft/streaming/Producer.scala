package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthetic trade-event producer — the ingestion-side analog of the
  * reference's websocket→Kafka producer
  * (`ingestion/producers/coinbase_producer.py`): it emits keyed JSON
  * trade payloads to a "topic" (a directory the file-source streams
  * consume), stamps an ingestion marker, and routes malformed payloads
  * to a dead-letter output instead of dropping them
  * (`coinbase_producer.py:105-161` `_produce_message`/`_send_to_dlq`).
  *
  * The payload contract is the SURVEY §1 events model, so everything a
  * flush produces feeds [[BronzeStream.writeBronzeCheckpointed]] and
  * the batch bronze ingest unchanged — the full producer → topic →
  * checkpointed-consumer → partitioned-bronze loop runs end-to-end in
  * Spark (tested in ProducerSpec).
  *
  * Determinism: tick `i` always yields the same event (id, product,
  * price, size, timestamp), and every 97th payload is emitted with
  * truncated JSON — a reproducible stand-in for the malformed websocket
  * frames the reference DLQs. No wall clock anywhere.
  *
  * Scale: one flush is a narrow `spark.range` projection — no shuffle,
  * no driver-side loop; a cluster deployment swaps the directory for a
  * Kafka topic and keeps the same payload columns.
  */
object Producer {

  val Products = Seq("click", "error", "purchase", "signup", "view")

  /** Every `DlqEvery`-th tick emits an unparseable payload (truncated
    * JSON), exercising the dead-letter route deterministically. */
  val DlqEvery = 97L

  private val baseTs = to_timestamp(lit("2024-01-01 00:00:00"))

  /** Deterministic synthetic events for ticks [startId, startId+n):
    * event_id, event_type, value, props (JSON payload), ts, plus the
    * producer's `_is_valid` marker (false = DLQ-bound). */
  def syntheticEvents(spark: SparkSession, startId: Long, n: Long): DataFrame =
    spark.range(startId, startId + n).toDF("event_id")
      .withColumn("event_type",
        element_at(array(Products.map(lit): _*),
          (col("event_id") % Products.size).cast("int") + 1))
      .withColumn("value",
        round(lit(100.0) + (col("event_id") % 1000).cast("double") / 10.0, 4))
      .withColumn("good_props",
        concat(lit("""{"k": """), (col("event_id") % 50 + 1).cast("string"), lit("}")))
      .withColumn("props",
        when(col("event_id") % DlqEvery === 0,
          substring(col("good_props"), 1, 5)) // truncated → unparseable
          .otherwise(col("good_props")))
      .withColumn("ts",
        expr("timestampadd(SECOND, cast(event_id % 86400 as int), " +
          "cast('2024-01-01 00:00:00' as timestamp))"))
      .withColumn("user_id", col("event_id") % 500)
      .withColumn("_is_valid",
        get_json_object(col("props"), "$.k").isNotNull)
      .select("event_id", "event_type", "value", "props", "ts", "user_id", "_is_valid")

  /** One producer flush: generate ticks [startId, startId+n), append
    * parseable payloads to `topicDir` (the Kafka-topic stand-in) and
    * malformed ones to `dlqDir` with the failure reason — the
    * reference's delivery/DLQ split, deterministic. Returns
    * (produced, deadLettered) counts. */
  def produceBatch(spark: SparkSession, topicDir: String, dlqDir: String,
                   startId: Long, n: Long): (Long, Long) = {
    val evs = syntheticEvents(spark, startId, n).persist()
    val good = evs.filter(col("_is_valid")).drop("_is_valid")
    val bad = evs.filter(!col("_is_valid")).drop("_is_valid")
      .withColumn("_dlq_reason", lit("unparseable payload json"))
    good.write.mode("append").parquet(topicDir)
    val nBad = bad.count()
    if (nBad > 0) bad.write.mode("append").parquet(dlqDir)
    val nGood = good.count()
    evs.unpersist()
    (nGood, nBad)
  }
}
