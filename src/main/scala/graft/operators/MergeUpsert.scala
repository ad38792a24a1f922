package graft.operators

import org.apache.spark.sql.DataFrame
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
}
