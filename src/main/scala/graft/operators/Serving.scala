package graft.operators

import org.apache.spark.sql.SparkSession

/** Interactive SQL serving surface — the Trino analog
  * (`infrastructure/trino/config.properties`: the reference fronts the
  * lakehouse with a SQL engine over the catalog's tables).
  *
  * Spark IS a SQL engine, so "serving" is registering the tables:
  * every view is a plain parquet scan of the governed layout, which
  * means ad-hoc `spark.sql` queries get partition pruning, filter
  * pushdown, and AQE exactly like the library operators do
  * (plan-asserted in the spec). A deployment exposes the same session
  * over the Spark Thrift/Connect server; nothing here is test-only
  * plumbing.
  *
  * Two registration modes mirror the reference's two consistency
  * models:
  *  - [[registerPipeline]]: live views over a [[PipelineRun]] layout —
  *    readers follow whatever the pipeline last wrote (Hive-style);
  *  - [[registerCatalog]]: views pinned to ONE [[Catalog]] commit —
  *    the whole SQL session sees a consistent cross-table snapshot, and
  *    later catalog commits are invisible until re-registration
  *    (Nessie/Trino-over-Iceberg semantics).
  */
object Serving {

  /** Register temp views over every stage table of a [[PipelineRun]]
    * layout at `outRoot` (bronze, silver, the marts, quality_report).
    * Returns the view names, `prefix`-qualified.
    *
    * Hive-style caveat: a view's plan caches the file listing, so
    * after the pipeline overwrites a stage directory, queries can hit
    * deleted files or a stale listing. Call [[refreshPipeline]] after
    * each run (the `REFRESH TABLE` discipline every Hive-layout
    * deployment has); the governed [[registerCatalog]] mode does not
    * have this problem — old versions are immutable. */
  def registerPipeline(spark: SparkSession, outRoot: String,
                       prefix: String = ""): Seq[String] =
    PipelineRun.Stages.map { t =>
      val view = prefix + t
      spark.read.parquet(s"$outRoot/$t").createOrReplaceTempView(view)
      view
    }

  /** Re-resolve a [[registerPipeline]] layout after a pipeline run
    * rewrote its directories: drops any cached data for the old file
    * listings and re-registers every view (a temp view's plan pins the
    * listing taken at registration — `refreshByPath` alone cannot
    * reach into it, so re-registration IS the refresh, same as Trino's
    * metadata refresh on a Hive table). Returns the view names. */
  def refreshPipeline(spark: SparkSession, outRoot: String,
                      prefix: String = ""): Seq[String] = {
    PipelineRun.Stages.foreach(t =>
      spark.catalog.refreshByPath(s"$outRoot/$t"))
    registerPipeline(spark, outRoot, prefix)
  }

  /** Register temp views over every table of a [[Catalog]], pinned to
    * `commit` (default: the latest published commit at call time).
    * Every view resolves through the SAME manifest, so SQL readers get
    * a consistent cross-table snapshot; a transaction published after
    * registration is invisible until views are re-registered. Returns
    * the served table → version mapping. */
  def registerCatalog(spark: SparkSession, root: String,
                      commit: Long = -1L, prefix: String = ""): Map[String, Long] = {
    val c = if (commit >= 0) commit else Catalog.latestCommit(root)
    require(c >= 0, s"no published catalog commit at $root")
    val versions = Catalog.tableVersions(root, c)
    versions.foreach { case (table, v) =>
      SnapshotTable.read(spark, Catalog.tableRoot(root, table), v)
        .createOrReplaceTempView(prefix + table)
    }
    versions
  }

  /** Timestamp time travel: [[registerCatalog]] pinned at the newest
    * commit published at or before `asOf` (Trino's
    * `FOR TIMESTAMP AS OF` over Iceberg/Nessie). Returns the served
    * table → version mapping at that commit. */
  def registerCatalogAsOf(spark: SparkSession, root: String,
                          asOf: java.time.Instant,
                          prefix: String = ""): Map[String, Long] =
    registerCatalog(spark, root,
      Catalog.resolveAsOf(root, asOf.toEpochMilli), prefix)

  /** Register temp views over a catalog BRANCH's head — SQL over
    * work-in-progress state without touching main readers (the
    * Nessie-branch-in-Trino use case: validate a multi-table change
    * with ad-hoc SQL before [[Catalog.fastForwardMain]] publishes it).
    * Returns the served table → version mapping at the branch head. */
  def registerCatalogBranch(spark: SparkSession, root: String, branch: String,
                            prefix: String = ""): Map[String, Long] = {
    val versions = Catalog.branchVersions(root, branch)
    versions.foreach { case (table, v) =>
      SnapshotTable.read(spark, Catalog.tableRoot(root, table), v)
        .createOrReplaceTempView(prefix + table)
    }
    versions
  }

  /** Register the pipeline-health dashboard view (the Grafana
    * `pipeline-health.json` analog as SQL) over a [[PipelineRun]]
    * layout's `_metrics` history. Returns the view name. */
  def registerPipelineHealth(spark: SparkSession, outRoot: String,
                             prefix: String = ""): String = {
    val view = prefix + "pipeline_health"
    MetricsHistory.health(MetricsHistory.history(spark, outRoot))
      .createOrReplaceTempView(view)
    view
  }

  /** [[registerPipelineHealth]] for a governed catalog: the rollup over
    * the `pipeline_metrics` table pinned at `commit` (default latest) —
    * health history consistent with the data snapshot it describes. */
  def registerCatalogHealth(spark: SparkSession, root: String,
                            commit: Long = -1L, prefix: String = ""): String = {
    val c = if (commit >= 0) commit else Catalog.latestCommit(root)
    require(c >= 0, s"no published catalog commit at $root")
    val v = Catalog.tableVersions(root, c).getOrElse("pipeline_metrics",
      throw new IllegalArgumentException(
        s"catalog at $root has no pipeline_metrics table at commit $c"))
    val view = prefix + "pipeline_health"
    MetricsHistory.health(SnapshotTable.read(spark,
        Catalog.tableRoot(root, "pipeline_metrics"), v))
      .createOrReplaceTempView(view)
    view
  }

  /** Register a table's METADATA inspection views — the Iceberg/Trino
    * `t$snapshots` / `t$files` / `t$refs` / `t$history` ops surface
    * ([[TableInspect]]) as SQL: `<name>_snapshots`, `<name>_files`,
    * `<name>_refs`, `<name>_history`, `<name>_properties`.
    * Metadata-only reads (no data bytes touched). Returns the view
    * names. */
  def registerTableMetadata(spark: SparkSession, root: String,
                            name: String): Seq[String] = {
    val views = Seq(
      s"${name}_snapshots" -> TableInspect.snapshots(spark, root),
      s"${name}_files" -> TableInspect.files(spark, root),
      s"${name}_refs" -> TableInspect.refs(spark, root),
      s"${name}_history" -> TableInspect.history(spark, root),
      s"${name}_properties" -> TableInspect.properties(spark, root))
    views.foreach { case (v, df) => df.createOrReplaceTempView(v) }
    views.map(_._1)
  }

  /** Drop previously registered views (cleanup for session reuse). */
  def unregister(spark: SparkSession, views: Iterable[String]): Unit =
    views.foreach(spark.catalog.dropTempView)
}
