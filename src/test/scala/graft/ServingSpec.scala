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
