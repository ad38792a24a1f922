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
    * WHEN NOT MATCHED INSERT ALL). Column sets must match. */
  def merge(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val untouched = target.join(source.select(key), Seq(key), "left_anti")
    untouched.unionByName(source.select(untouched.columns.map(col): _*))
  }
}
