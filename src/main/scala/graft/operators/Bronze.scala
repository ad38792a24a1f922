package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raw-event → Bronze trade ingest.
  *
  * Re-expresses the reference's streaming bronze writer transform
  * (`processing/spark_jobs/streaming_bronze_writer.py:132-166`) as a pure
  * batch DataFrame function over the driver's `events` table, using the
  * deterministic trade model from SURVEY §1:
  *
  *   trade_id   = event_id
  *   product_id = event_type
  *   price      = value                        (double at bronze)
  *   size       = props ->> '$.k'              (JSON extraction, double)
  *   side       = 'buy' / 'sell' by event_id parity
  *   trade_time = ts
  *   ingested_at = ts + (event_id % 600) seconds  (synthetic ingest lag)
  *
  * The JSON field extraction (`get_json_object`) mirrors the reference's
  * `from_json` payload parse; `_raw_payload` keeps the original JSON and
  * `_ingestion_date` is the bronze partition column
  * (`streaming_bronze_writer.py:150-152`).
  *
  * Scale: narrow, shuffle-free projection — safe at any input size; the
  * `_ingestion_date` column is what a cluster deployment would partition
  * the bronze table by.
  */
object Bronze {

  /** events → bronze trades (one row per raw event). */
  def ingest(events: DataFrame): DataFrame =
    events.select(
      col("event_id").as("trade_id"),
      col("event_type").as("product_id"),
      col("value").as("price"),
      get_json_object(col("props"), "$.k").cast("double").as("size"),
      when(col("event_id") % 2 === 0, lit("buy")).otherwise(lit("sell")).as("side"),
      col("ts").as("trade_time"),
      expr("timestampadd(SECOND, cast(event_id % 600 as int), ts)").as("ingested_at"),
      col("props").as("_raw_payload")
    ).withColumn("_ingestion_date", to_date(col("ingested_at")))
      .filter(col("trade_id").isNotNull)

  /** Write bronze partitioned by `_ingestion_date` — the reference's
    * bronze layout (`streaming_bronze_writer.py:149-166`). At 100 TB
    * this layout is what makes incremental reads partition-prunable:
    * see [[BronzeToSilver.incrementalReadPartitioned]] and the
    * plan-asserted pruning test in PipelineSpec. */
  def writePartitioned(bronze: DataFrame, path: String,
                       mode: String = "overwrite"): Unit =
    bronze.write.mode(mode).partitionBy("_ingestion_date").parquet(path)

  /** Bronze with deterministic at-least-once redeliveries: every 10th
    * trade is re-ingested 900 s later (same payload, later ingest time).
    * Models the duplicate delivery the reference's silver dedup exists
    * for (`bronze_to_silver.py:96-105`).
    */
  def withRedeliveries(bronze: DataFrame): DataFrame =
    // one explode pass, not `bronze union bronze.filter(...)` — the
    // union shape evaluated the whole ingest subtree (a JSON-parsing
    // projection over the raw events) once per branch; every 10th row
    // emits a second copy shifted 900 s, all others emit themselves,
    // and the multiset of output rows is exactly the old union's
    bronze
      .select(col("*"), explode(
        when(col("trade_id") % 10 === 0, array(lit(0), lit(900)))
          .otherwise(array(lit(0)))).as("_redeliver_s"))
      .withColumn("ingested_at",
        expr("timestampadd(SECOND, _redeliver_s, ingested_at)"))
      .withColumn("_ingestion_date", to_date(col("ingested_at")))
      .drop("_redeliver_s")
}
