package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension TYPE 2 maintenance — the dbt `snapshot`
  * (check strategy) the reference's dbt layer would use for
  * dimension history (`processing/dbt/`): a dimension keeps EVERY
  * historical version of a row as (attributes, valid_from, valid_to,
  * is_current), and applying a batch of fresh rows closes changed
  * versions and opens new ones — the warehouse op behind "what did
  * this customer's segment look like last quarter".
  *
  * Merge semantics (check strategy): per key, a batch row that
  * differs in ANY tracked attribute from the key's current version
  * closes that version (`valid_to` = the batch row's timestamp) and
  * opens a new current one (`valid_from` = same); an identical batch
  * row is a no-op; a new key opens its first version; history rows
  * pass through untouched. Attribute comparison is null-safe.
  *
  * Scale shape: ONE key shuffle per merge — current rows full-outer
  * join the batch on the key; closed history never joins (filtered
  * before the exchange, the reason history accumulates for free).
  * Batches are typically ≪ the dimension, so the join broadcasts;
  * at 100 TB the history table partitions by `is_current` (hot
  * current slice compact) and the merge lands as a
  * [[SnapshotTable.commitDelta]] of the current partition. All
  * comparisons/timestamps are exact — no FP anywhere — so the merged
  * history is engine-reproducible. */
object ScdTwo {

  private val Meta = Seq("valid_from", "valid_to", "is_current")

  /** Open a first version for every source row: (source columns,
    * valid_from = tsCol, valid_to = NULL, is_current = true). */
  def init(source: DataFrame, tsCol: String): DataFrame =
    source
      .withColumn("valid_from", col(tsCol))
      .withColumn("valid_to", lit(null).cast(source.schema(tsCol).dataType))
      .withColumn("is_current", lit(true))

  /** Apply `batch` (one fresh row per key, timestamped `tsCol`) to the
    * history table `dim`. Tracked attributes = every non-key, non-meta,
    * non-timestamp column of the batch — a batch row whose tracked
    * attributes are unchanged is a no-op even if its timestamp is
    * newer (the dbt check-strategy rule; tracking the timestamp would
    * version every heartbeat). */
  def merge(dim: DataFrame, batch: DataFrame, key: String,
            tsCol: String): DataFrame = {
    require(batch.columns.contains(tsCol),
      s"timestamp column '$tsCol' must be a batch column")
    // carried into a new version (incl. the timestamp value)...
    val attrs = batch.columns.filterNot(c => c == key || Meta.contains(c))
      .toSeq
    // ...but only these decide whether a version changed
    val tracked = attrs.filterNot(_ == tsCol)
    require(tracked.nonEmpty, "SCD2 needs at least one tracked attribute")
    val history = dim.filter(!col("is_current"))
    val current = dim.filter(col("is_current"))
    val b = batch.select(col(key).as("_bk") +:
      attrs.map(c => col(c).as(s"_b_$c")): _*)
    val j = current.join(b, col(key) === col("_bk"), "full_outer")
    // null-safe "any tracked attribute changed"
    val changed = tracked.map(c => !(col(c) <=> col(s"_b_$c")))
      .reduce(_ || _)
    val batchTs = col(s"_b_$tsCol")
    // unchanged current rows (and keys absent from the batch) survive
    val kept = j.filter(col(key).isNotNull &&
        (col("_bk").isNull || !changed))
      .select(dim.columns.map(col): _*)
    // changed current rows close at the batch timestamp
    val closedCols = dim.columns.map {
      case "valid_to" => batchTs.as("valid_to")
      case "is_current" => lit(false).as("is_current")
      case c => col(c)
    }
    val closed = j.filter(col(key).isNotNull && col("_bk").isNotNull &&
      changed).select(closedCols.toSeq: _*)
    // changed + brand-new keys open a new current version
    val openedCols = dim.columns.map {
      case "valid_from" => batchTs.as("valid_from")
      case "valid_to" => lit(null).cast(dim.schema("valid_from").dataType)
        .as("valid_to")
      case "is_current" => lit(true).as("is_current")
      case c if c == key => col("_bk").as(key)
      case c => col(s"_b_$c").as(c)
    }
    val opened = j.filter(col("_bk").isNotNull &&
      (col(key).isNull || changed)).select(openedCols.toSeq: _*)
    history.unionByName(kept).unionByName(closed).unionByName(opened)
  }

  /** The dimension AS OF an instant: the version whose
    * [valid_from, valid_to) interval covers `ts` (open-ended current
    * versions cover everything from their valid_from). */
  def asOf(dim: DataFrame, ts: java.sql.Timestamp): DataFrame =
    dim.filter(col("valid_from") <= lit(ts) &&
      (col("valid_to").isNull || col("valid_to") > lit(ts)))
}
