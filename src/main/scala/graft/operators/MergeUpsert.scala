package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** MERGE upsert as a Spark-native join algorithm.
  *
  * The reference merges a silver batch into an Iceberg table with
  * `MERGE INTO ... WHEN MATCHED THEN UPDATE / WHEN NOT MATCHED THEN
  * INSERT` (`bronze_to_silver.py:156-188`). No ACID-table jars ship in
  * this environment, so the same semantics are expressed as the
  * canonical copy-on-write plan an ACID engine would run underneath:
  *
  *   result = source ∪ (target ⟕anti source on key)
  *
  * i.e. every source row wins (UPDATE or INSERT), target rows without a
  * matching source key survive unchanged.
  *
  * Scale: one shuffle on the merge key for the anti join (or zero if the
  * source is broadcastable — typical for incremental batches, and
  * Catalyst/AQE picks broadcast automatically when the source is small).
  * A production deployment would additionally use the target's
  * partitioning (`_trade_date`) for dynamic file pruning; the join shape
  * is identical.
  */
object MergeUpsert {

  /** Upsert `source` into `target` on `key` (WHEN MATCHED UPDATE ALL /
    * WHEN NOT MATCHED INSERT ALL), with Iceberg-style add-column schema
    * evolution: source columns absent from the target WIDEN the result
    * (pre-existing target rows carry NULL there — exactly what the
    * reference gets free from Iceberg MERGE on a producer-side field
    * addition, `bronze_to_silver.py:156-188`); a source MISSING target
    * columns is rejected (dropping columns via merge is always a bug,
    * never an evolution). */
  def merge(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val tCols = target.columns.toSeq
    val dropped = tCols.filterNot(source.columns.contains)
    require(dropped.isEmpty,
      s"MERGE source is missing target column(s) ${dropped.mkString(", ")}: " +
        "column drops are rejected; add-only schema evolution is supported")
    val added = source.columns.filterNot(tCols.contains).toSeq
    val widened = added.foldLeft(target) { (t, c) =>
      t.withColumn(c, lit(null).cast(source.schema(c).dataType))
    }
    val untouched = widened.join(source.select(key), Seq(key), "left_anti")
    untouched.unionByName(source.select(untouched.columns.map(col): _*))
  }

  /** MERGE whose matched-row resolution is keep-FIRST by `orderCols`
    * (`WHEN MATCHED AND source.ord < target.ord THEN UPDATE`): of all
    * rows sharing a key across target and source, the one ordered first
    * wins whole-row. This is the conflict rule an incremental dedup
    * pipeline needs — re-merging an overlap window or a late
    * redelivery of an already-landed row is a no-op, so the merge is
    * idempotent and a sequence of incremental merges lands bit-identical
    * to a global keep-earliest rebuild ([[PipelineRun.runIncremental]]).
    *
    * Scale: one hash-partitioned window over target ∪ source on the
    * key — the same single-shuffle shape as [[BronzeToSilver.dedup]];
    * with a date-partition-pruned target slice the window only ever
    * sees the touched partitions. */
  def mergeKeepFirst(target: DataFrame, source: DataFrame, key: String,
                     orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(target.columns.toSet == source.columns.toSet,
      "mergeKeepFirst requires identical target/source schemas")
    val w = Window.partitionBy(key).orderBy(orderCols: _*)
    target.unionByName(source.select(target.columns.map(col): _*))
      .withColumn("_mrn", row_number().over(w))
      .filter(col("_mrn") === 1)
      .drop("_mrn")
  }
}
