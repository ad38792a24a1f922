package graft.operators


import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained MATERIALIZED VIEW over a [[SnapshotTable]]
  * — the "aggregate mart that keeps itself fresh" capability
  * (Materialize / Delta Live Tables; the reference's dbt marts
  * recompute on schedule instead, `processing/dbt/models/marts/`):
  * a groupBy aggregate (count + exact decimal sums) whose refresh
  * applies the base table's row-level CDC feed
  * ([[SnapshotTable.changes]]) instead of re-aggregating the base.
  *
  * Refresh cost: O(rows changed since the last refresh) + one merge
  * against the ‖groups‖-sized view — the base fact is NEVER rescanned,
  * which is what keeps an aggregate over a 100 TB table maintainable
  * at micro-batch cadence. Distributive aggregates only (count, sum;
  * avg/ratios derive at read time): inserts and update-postimages add,
  * deletes and update-preimages subtract, and because the sums are
  * exact decimals the incremented view is BIT-IDENTICAL to a full
  * recompute under any partitioning or refresh batching (spec-pinned;
  * a float sum would drift apart refresh-by-refresh). A group whose
  * count reaches zero leaves the view — the classic IVM rule.
  *
  * The view itself is a [[SnapshotTable]] (versioned, time-travelable,
  * servable); `_mv_def` records the maintained definition plus the
  * base version the view covers, so refresh is idempotent and
  * self-anchoring like [[PipelineRun.runIncremental]]'s watermark. */
object MaterializedView {

  private case class Def(rowKey: String, keys: Seq[String],
                         sumCols: Seq[String], baseVersion: Long)

  private def defPath(mvRoot: String) = MetaIO.join(mvRoot, "_mv_def")

  private def writeDef(mvRoot: String, d: Def): Unit =
    MetaIO.writeString(defPath(mvRoot),
      s"${d.rowKey}\n${d.keys.mkString(",")}\n" +
        s"${d.sumCols.mkString(",")}\n${d.baseVersion}")

  private def readDef(mvRoot: String): Def = {
    val p = defPath(mvRoot)
    require(MetaIO.exists(p), s"no materialized view at $mvRoot")
    val ls = MetaIO.readString(p).linesIterator.toSeq
    Def(ls.head, ls(1).split(",").toSeq.filter(_.nonEmpty),
      ls(2).split(",").toSeq.filter(_.nonEmpty), ls(3).toLong)
  }

  /** The base version the view currently covers. */
  def coveredBaseVersion(mvRoot: String): Long = readDef(mvRoot).baseVersion

  private def intentPath(mvRoot: String) = MetaIO.join(mvRoot, "_mv_intent")

  /** Heal a crash inside a refresh: the view commit and the anchor
    * advance are two steps, so a refresh writes an INTENT (`toV`,
    * expected view version) first. If the expected version landed but
    * the anchor didn't, the crash was between the two — finalize the
    * anchor so the replay doesn't re-apply an already-merged delta
    * (double-counted sums); if the version never landed, the crash was
    * pre-commit — the intent is discarded and the replay recomputes. */
  private def heal(mvRoot: String): Unit = {
    val p = intentPath(mvRoot)
    if (!MetaIO.exists(p)) return
    val parts = MetaIO.readString(p).trim.split(" ")
    val (toV, expectV) = (parts(0).toLong, parts(1).toLong)
    if (SnapshotTable.latestVersion(mvRoot) >= expectV)
      writeDef(mvRoot, readDef(mvRoot).copy(baseVersion = toV))
    MetaIO.delete(p)
  }

  // exact per-row decimal; the stored sum type is pinned to
  // DECIMAL(28,4) so every refresh adds in the same type
  private def rowDec(c: Column): Column = c.cast("decimal(18,4)")
  private def sumType(c: Column): Column = c.cast("decimal(28,4)")

  private def aggregateBase(df: DataFrame, keys: Seq[String],
                            sumCols: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("n_rows") +:
      sumCols.map(c => sumType(sum(rowDec(col(c)))).as(s"${c}_sum"))
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Create the view: ONE full aggregation of the base's current
    * snapshot (the only full scan the view ever takes), committed as
    * the view table's first version. `rowKey` is the base's row
    * identity the CDC diff keys on. Returns the view version. */
  def create(spark: SparkSession, baseRoot: String, mvRoot: String,
             rowKey: String, keys: Seq[String],
             sumCols: Seq[String], baseVersion: Long = -1L): Long = {
    require(keys.nonEmpty, "materialized view needs group keys")
    // an explicit base version serves catalog-governed tables, whose
    // versions advance through catalog manifests, not table markers
    val baseV =
      if (baseVersion >= 0) baseVersion
      else SnapshotTable.latestVersion(baseRoot)
    require(baseV >= 0, s"no committed base version at $baseRoot")
    val v = SnapshotTable.commit(
      aggregateBase(SnapshotTable.read(spark, baseRoot, baseV), keys,
        sumCols), mvRoot)
    writeDef(mvRoot, Def(rowKey, keys, sumCols, baseV))
    v
  }

  /** Is the base history `from..to` PURE appends — no manifest entry
    * dropped (no compaction/CoW rewrite) and no new merge-on-read
    * delete sidecar of either flavor? Then every row of the range is
    * an insert and the MV delta reads ONLY the new files. */
  private[graft] def isAppendOnly(baseRoot: String, from: Long,
                                  to: Long): Boolean = {
    val fe = SnapshotTable.manifestEntries(baseRoot, from)
    val te = SnapshotTable.manifestEntries(baseRoot, to)
    fe.nonEmpty && te.nonEmpty && (fe.toSet -- te.toSet).isEmpty &&
      SnapshotTable.deleteEntries(baseRoot, to) ==
        SnapshotTable.deleteEntries(baseRoot, from) &&
      SnapshotTable.eqDeleteEntries(baseRoot, to) ==
        SnapshotTable.eqDeleteEntries(baseRoot, from)
  }

  /** Refresh the view to the base's current version by applying ONLY
    * the CDC delta since the covered version: signed per-group count
    * and sum deltas from the change feed (insert/update_postimage +1,
    * delete/update_preimage −1), merged into the view with one
    * null-safe full-outer join on the group keys. Commits a new view
    * version and advances the covered base version; a no-change
    * refresh is a no-op. Returns the view version.
    *
    * Cost: for a PURE-append history (the streaming-ingest shape) the
    * delta reads only the NEW files ([[SnapshotTable.appendedBetween]]
    * — O(batch), the micro-batch-cadence path); otherwise the general
    * row-diff change feed runs (one join of the two snapshots). */
  def refresh(spark: SparkSession, baseRoot: String,
              mvRoot: String, toVersion: Long = -1L): Long = {
    heal(mvRoot)
    val d = readDef(mvRoot)
    val toV =
      if (toVersion >= 0) toVersion
      else SnapshotTable.latestVersion(baseRoot)
    if (toV == d.baseVersion) return SnapshotTable.latestVersion(mvRoot)
    val (ch, sign) =
      if (isAppendOnly(baseRoot, d.baseVersion, toV))
        (SnapshotTable.appendedBetween(spark, baseRoot, d.baseVersion,
          toV), lit(1))
      else
        (SnapshotTable.changes(spark, baseRoot, d.rowKey,
          d.baseVersion, toV),
          when(col("_change_type").isin("insert", "update_postimage"),
            lit(1)).otherwise(lit(-1)))
    val deltaAggs = sum(sign.cast("long")).as("d_rows") +:
      d.sumCols.map(c =>
        sumType(sum(rowDec(col(c)) * sign)).as(s"d_${c}_sum"))
    val deltas = ch.groupBy(d.keys.map(col): _*)
      .agg(deltaAggs.head, deltaAggs.tail: _*)
    val mv = SnapshotTable.read(spark, mvRoot)
    // null-safe key equality: a NULL group is a group like any other
    val cond = d.keys.map(k => mv(k) <=> deltas(k)).reduce(_ && _)
    val zero = lit(0).cast("decimal(28,4)")
    val merged = mv.join(deltas, cond, "full_outer")
      .select(
        d.keys.map(k => coalesce(mv(k), deltas(k)).as(k)) ++
          Seq((coalesce(col("n_rows"), lit(0L)) +
            coalesce(col("d_rows"), lit(0L))).as("n_rows")) ++
          d.sumCols.map(c =>
            sumType(coalesce(col(s"${c}_sum"), zero) +
              coalesce(col(s"d_${c}_sum"), zero)).as(s"${c}_sum")): _*)
      .filter(col("n_rows") > 0)
    // intent before commit; anchor + intent-clear after — [[heal]]
    // resolves the crash windows on the next refresh
    MetaIO.writeString(intentPath(mvRoot),
      s"$toV ${SnapshotTable.latestVersion(mvRoot) + 1}")
    val v = SnapshotTable.commit(merged, mvRoot)
    writeDef(mvRoot, d.copy(baseVersion = toV))
    MetaIO.delete(intentPath(mvRoot))
    v
  }
}
