package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Catalog, PipelineRun, Serving}

/** SQL serving surface over the pipeline layout and the catalog. */
class ServingSpec extends GraftSuite {
  import spark.implicits._

  test("pipeline views serve ad-hoc SQL with partition pruning intact") {
    val out = Files.createTempDirectory("graft-serve").toString
    PipelineRun.run(spark, sf, out)
    val views = Serving.registerPipeline(spark, out, prefix = "srv_")
    assert(views === PipelineRun.Stages.map("srv_" + _))

    // marts answer SQL
    val vol = spark.sql(
      """SELECT product_id, CAST(SUM(volume) AS DOUBLE) AS vol
        |FROM srv_ohlcv_1h GROUP BY product_id""".stripMargin)
    assert(vol.count() === 5)
    // cross-view join: latest price against daily high/low of its day
    val joined = spark.sql(
      """SELECT p.product_id, p.price, d.high, d.low
        |FROM srv_price_latest p
        |JOIN srv_daily_metrics d
        |  ON p.product_id = d.product_id AND d.date = to_date(p.updated_at)""".stripMargin)
    assert(joined.count() === 5)

    // a date predicate reaches the silver scan as a PartitionFilter —
    // serving is the same pruned scan the operators get, not a re-read
    val pruned = spark.sql(
      "SELECT * FROM srv_silver WHERE _trade_date = DATE'2024-01-15'")
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty))
    assert(scans.head.selectedPartitions.partitionCount === 1)

    Serving.unregister(spark, views)
    assert(!spark.catalog.tableExists("srv_silver"))
  }

  test("catalog views pin one commit: a consistent snapshot until re-registered") {
    val root = Files.createTempDirectory("graft-serve-cat").toString
    Catalog.transact(root, Seq(
      "prices" -> Seq((1L, 100.0), (2L, 200.0)).toDF("id", "px"),
      "meta" -> Seq((1L, "btc"), (2L, "eth")).toDF("id", "sym")))

    val served = Serving.registerCatalog(spark, root)
    assert(served === Map("prices" -> 0L, "meta" -> 0L))

    // a later transaction must NOT leak into the registered session
    Catalog.transact(root, Seq(
      "prices" -> Seq((1L, 111.0), (2L, 222.0)).toDF("id", "px")))
    val snap = spark.sql(
      """SELECT m.sym, p.px FROM prices p JOIN meta m ON p.id = m.id
        |ORDER BY m.sym""".stripMargin).collect()
    assert(snap.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("btc", 100.0), ("eth", 200.0)))

    // re-registration serves the new commit, still consistent
    val served2 = Serving.registerCatalog(spark, root)
    assert(served2("prices") === 1L && served2("meta") === 0L)
    assert(spark.sql("SELECT CAST(SUM(px) AS DOUBLE) s FROM prices")
      .head().getDouble(0) === 333.0)

    // time travel for SQL readers: pin the old commit explicitly
    Serving.registerCatalog(spark, root, commit = 0L, prefix = "old_")
    assert(spark.sql("SELECT CAST(SUM(px) AS DOUBLE) s FROM old_prices")
      .head().getDouble(0) === 300.0)

    Serving.unregister(spark, Seq("prices", "meta", "old_prices", "old_meta"))
  }

  test("as-of-timestamp registration resolves the newest commit at that instant") {
    val root = Files.createTempDirectory("graft-serve-asof").toString
    Catalog.transact(root, Seq(
      "prices" -> Seq((1L, 100.0)).toDF("id", "px")))
    Thread.sleep(10L)
    val mid = java.time.Instant.now()
    Thread.sleep(10L)
    Catalog.transact(root, Seq(
      "prices" -> Seq((1L, 111.0), (2L, 222.0)).toDF("id", "px")))

    // at `mid` only commit 0 existed
    val servedMid = Serving.registerCatalogAsOf(spark, root, mid,
      prefix = "asof_")
    assert(servedMid("prices") === 0L)
    assert(spark.sql("SELECT px FROM asof_prices").collect()
      .map(_.getDouble(0)).toSeq === Seq(100.0))
    // now resolves the latest commit
    val servedNow = Serving.registerCatalogAsOf(spark, root,
      java.time.Instant.now(), prefix = "asofnow_")
    assert(servedNow("prices") === 1L)
    assert(spark.sql("SELECT count(*) FROM asofnow_prices").head()
      .getLong(0) === 2L)
    // before the first publish: no resolvable commit
    intercept[IllegalArgumentException] {
      Catalog.resolveAsOf(root, 0L)
    }
    // rollback does not erase the as-of log: `now` still resolves the
    // rolled-back-from commit (it existed at that wall time)
    Catalog.rollback(root, 0L)
    assert(Catalog.resolveAsOf(root,
      java.time.Instant.now().toEpochMilli) === 1L)
    Serving.unregister(spark, Seq("asof_prices", "asofnow_prices"))
  }

  test("refreshPipeline re-resolves overwritten stage directories for live views") {
    val out = Files.createTempDirectory("graft-serve-refresh").toString
    val events = graft.sources.Tables.events(spark, sf)
    PipelineRun.run(spark, sf, out,
      eventsOverride = Some(events.filter(col("event_id") % 2 === 0)))
    val views = Serving.registerPipeline(spark, out, prefix = "rf_")
    val n1 = spark.sql("SELECT count(*) FROM rf_silver").head().getLong(0)

    // the pipeline rewrites every stage directory (more rows now)
    PipelineRun.run(spark, sf, out, eventsOverride = Some(events))
    Serving.refreshPipeline(spark, out, prefix = "rf_")
    val n2 = spark.sql("SELECT count(*) FROM rf_silver").head().getLong(0)
    assert(n2 > n1, s"refresh must surface the rewritten layout ($n1 -> $n2)")
    Serving.unregister(spark, views)
  }

  test("branch views serve work-in-progress SQL; main views are untouched") {
    val root = Files.createTempDirectory("graft-serve-branch").toString
    Catalog.transact(root, Seq(
      "prices" -> Seq((1L, 100.0), (2L, 200.0)).toDF("id", "px"),
      "meta" -> Seq((1L, "btc"), (2L, "eth")).toDF("id", "sym")))
    Catalog.createBranch(root, "wip")
    Catalog.transactOnBranch(root, "wip", Seq(
      "prices" -> Seq((1L, 111.0), (2L, 222.0)).toDF("id", "px"),
      "meta" -> Seq((1L, "BTC-USD"), (2L, "ETH-USD")).toDF("id", "sym")))

    // validate the multi-table change with ad-hoc SQL pre-publication
    Serving.registerCatalog(spark, root, prefix = "main_")
    Serving.registerCatalogBranch(spark, root, "wip", prefix = "wip_")
    val joined = spark.sql(
      """SELECT m.sym, CAST(p.px AS DOUBLE) px
        |FROM wip_prices p JOIN wip_meta m ON p.id = m.id
        |ORDER BY m.sym""".stripMargin).collect()
    assert(joined.map(r => (r.getString(0), r.getDouble(1))).toSeq ===
      Seq(("BTC-USD", 111.0), ("ETH-USD", 222.0)))
    assert(spark.sql("SELECT CAST(SUM(px) AS DOUBLE) s FROM main_prices")
      .head().getDouble(0) === 300.0)

    Serving.unregister(spark,
      Seq("main_prices", "main_meta", "wip_prices", "wip_meta"))
  }
}
