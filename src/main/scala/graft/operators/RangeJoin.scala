package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed interval-containment (range/band) join.
  *
  * Spark has no native band join: a raw `a.start <= b.ts AND b.ts <
  * a.end` condition plans as BroadcastNestedLoopJoin / cartesian —
  * O(‖intervals‖·‖points‖) and a driver OOM the moment neither side
  * broadcasts. The scale path here is BUCKET EXPANSION: pick a bucket
  * width, explode each interval into the time buckets it covers
  * (fan-out = ceil(len/width)+1 rows — bounded and chosen, not data-
  * driven), hash each point into its single bucket, and equi-join on
  * (keys…, bucket) with the range predicate as a residual filter.
  *
  * Because a point lives in EXACTLY one bucket and the exploded
  * interval covers that bucket iff the pair can match, every
  * qualifying pair meets exactly once — no post-join dedup. The
  * equi-join shuffles on (keys…, bucket), so skew splits across an
  * interval's buckets instead of serializing one key, and AQE's skew
  * handling applies (it never does for nested-loop joins).
  *
  * Interval semantics: inclusive start, EXCLUSIVE end — the candle /
  * session convention everywhere else in this engine.
  */
object RangeJoin {

  /** Join `points` (instant `tsCol`) into `intervals` ([`startCol`,
    * `endCol`) half-open) on equal `keys` + containment. Both inputs
    * must carry the `keys` columns under the same names; timestamps
    * are NTZ/LTZ alike (bucketed on their UTC microsecond epoch).
    * `bucketSeconds` defaults to 5 minutes — size it near the typical
    * interval length so fan-out stays ~2 rows per interval. */
  def intervalJoin(intervals: DataFrame, points: DataFrame,
                   keys: Seq[String], startCol: String, endCol: String,
                   tsCol: String, bucketSeconds: Long = 300L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val bw = bucketSeconds * 1000000L // microseconds per bucket
    val iv = intervals
      .withColumn("_s_us", unix_micros(col(startCol).cast("timestamp")))
      .withColumn("_e_us", unix_micros(col(endCol).cast("timestamp")))
      .filter(col("_e_us") > col("_s_us")) // empty interval matches nothing
      // covered buckets: floor(start/w) .. floor((end-1)/w) — end is
      // exclusive, so an interval ending ON a boundary stops short
      .withColumn("_bkt", explode(sequence(
        floor(col("_s_us") / bw).cast("long"),
        floor((col("_e_us") - 1) / bw).cast("long"))))
    val pt = points
      .withColumn("_ts_us", unix_micros(col(tsCol).cast("timestamp")))
      .withColumn("_bkt", floor(col("_ts_us") / bw).cast("long"))
    iv.join(pt, keys :+ "_bkt")
      .filter(col("_ts_us") >= col("_s_us") && col("_ts_us") < col("_e_us"))
      .drop("_s_us", "_e_us", "_ts_us", "_bkt")
  }
}
