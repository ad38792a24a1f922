package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bronze → Silver batch pipeline.
  *
  * Re-expresses `processing/spark_jobs/bronze_to_silver.py` Spark-first:
  *  - dedup by trade_id keeping the earliest ingest — a single
  *    `row_number` hash-partition window (`bronze_to_silver.py:96-105`),
  *    never a global sort;
  *  - type casts string/double → DECIMAL(18,8) money columns
  *    (`bronze_to_silver.py:108-118`);
  *  - ingest-latency ms + late-arrival flag (`bronze_to_silver.py:120-131`);
  *  - `_trade_date` partition column + validity filters
  *    (`bronze_to_silver.py:133-151`);
  *  - watermark-lookback incremental read (`bronze_to_silver.py:74-91`),
  *    anchored to max ingest ts so it is deterministic;
  *  - per-product stats with conditional aggregation
  *    (`bronze_to_silver.py:191-209`).
  *
  * Scale: dedup + stats each shuffle exactly once on their key; the
  * incremental filter is a partition-prunable predicate on the bronze
  * partition column's parent timestamp. Decimal sums keep aggregates
  * exact and order-independent at any parallelism.
  */
object BronzeToSilver {

  val LateArrivalThresholdMs = 300000L // 5 minutes, as the reference

  /** Dedup by trade_id, keep earliest ingested_at (tie-broken — ingest
    * times are unique per trade in this model). One hash shuffle. */
  def dedup(bronze: DataFrame): DataFrame = {
    val w = Window.partitionBy("trade_id").orderBy(col("ingested_at"))
    bronze
      .withColumn("row_num", row_number().over(w))
      .filter(col("row_num") === 1)
      .drop("row_num")
  }

  /** Full bronze → silver transform (dedup + cast + latency + filters). */
  def transform(bronze: DataFrame): DataFrame =
    dedup(bronze)
      .withColumn("price", col("price").cast("decimal(18,8)"))
      .withColumn("size", col("size").cast("decimal(18,8)"))
      .withColumn(
        "_source_latency_ms",
        expr("timestampdiff(SECOND, trade_time, ingested_at) * 1000"))
      .withColumn("_is_late_arrival",
        col("_source_latency_ms") > lit(LateArrivalThresholdMs))
      .withColumn("_trade_date", to_date(col("trade_time")))
      .select(
        "trade_id", "product_id", "price", "size", "side",
        "trade_time", "ingested_at",
        "_is_late_arrival", "_source_latency_ms", "_trade_date")
      .filter(col("trade_id").isNotNull)
      .filter(col("price").isNotNull && col("price") > 0)
      .filter(col("trade_time").isNotNull)

  /** Write silver partitioned by `_trade_date` — the reference's silver
    * layout (`bronze_to_silver.py:108-151`), which makes MERGE targets
    * and date-bounded marts partition-prunable at scale. */
  def writePartitioned(silver: DataFrame, path: String,
                       mode: String = "overwrite"): Unit =
    silver.write.mode(mode).partitionBy("_trade_date").parquet(path)

  /** Incremental read: bronze rows ingested within `lookbackHours` of the
    * newest ingest timestamp. Deterministic analog of the reference's
    * `utcnow() - lookback` cutoff.
    *
    * The input is persisted so the (possibly expensive) bronze chain —
    * JSON extraction included — materializes ONCE: the cutoff aggregate
    * populates the cache, the filter pass reads it. The cached stage
    * lives for the session (same contract as Dedup's signature caches);
    * long-lived callers should clearCache/unpersist after consuming.
    * Against a stored partitioned table use
    * [[incrementalReadPartitioned]], which prunes instead of caching. */
  def incrementalRead(bronze: DataFrame, lookbackHours: Int = 2): DataFrame = {
    val b = bronze.persist()
    val cutoff = b.agg(
      expr(s"timestampadd(HOUR, ${-lookbackHours}, max(ingested_at))").as("_cutoff"))
    b.crossJoin(broadcast(cutoff))
      .filter(col("ingested_at") >= col("_cutoff"))
      .drop("_cutoff")
  }

  /** Incremental read against a bronze table written with
    * [[Bronze.writePartitioned]]: the lookback cutoff is resolved to a
    * LITERAL first, so the `_ingestion_date` predicate partition-prunes
    * the scan (PartitionFilters in the plan — asserted by test).
    *
    * The single-row `head()` is the planning-time watermark resolution
    * every real incremental pipeline performs (Iceberg/Delta read it
    * from snapshot metadata; here it is a column-pruned max over
    * parquet footer stats) — it is not a data collect, and it is the
    * step a dynamic (join-based) cutoff cannot replace, because a
    * runtime cutoff can never prune partitions at planning time. */
  def incrementalReadPartitioned(spark: SparkSession, path: String,
                                 lookbackHours: Int = 2): DataFrame = {
    val t = spark.read.parquet(path)
    val maxTs = t.agg(max("ingested_at")).head().getAs[java.time.LocalDateTime](0)
    // empty table (or all-NULL ingested_at): max() is one NULL row —
    // mirror incrementalRead's behavior and return the empty frame
    // rather than NPE on minusHours
    if (maxTs == null) return t.filter(lit(false))
    val cutoff = maxTs.minusHours(lookbackHours.toLong)
    t.filter(col("_ingestion_date") >= lit(java.sql.Date.valueOf(cutoff.toLocalDate))
      && col("ingested_at") >= lit(cutoff))
  }

  /** Per-product silver stats with conditional aggregation.
    * avg latency is computed as exact long sum / count (deterministic
    * under any partitioning, unlike a naive double avg). */
  def stats(silver: DataFrame): DataFrame =
    silver.groupBy("product_id").agg(
      count(lit(1)).as("trade_count"),
      min("trade_time").as("earliest_trade"),
      max("trade_time").as("latest_trade"),
      (sum("_source_latency_ms").cast("double") / count(lit(1))).as("avg_latency_ms"),
      sum(when(col("_is_late_arrival"), 1L).otherwise(0L)).as("late_arrivals"))
}
