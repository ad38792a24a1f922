package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bronze, BronzeToSilver, DailyMetrics, MarketDashboard, Ohlcv, PipelineRun, PriceLatest, Staging}
import graft.sources.Tables

/** Market-dashboard rollup: one row per product, panels re-derived
  * independently, and the Serving-style SQL view. */
class MarketDashboardSpec extends GraftSuite {

  private lazy val st = Staging.stgTrades(BronzeToSilver.transform(
    Bronze.withRedeliveries(Bronze.ingest(Tables.events(spark, sf))))).cache()
  private lazy val m1 = Ohlcv.ohlcv1m(st).cache()
  private lazy val h1 = Ohlcv.ohlcv1h(m1).cache()

  test("one row per product; trailing-24h rollup re-derives independently") {
    val latest = PriceLatest.latest(st, m1, h1, DailyMetrics.daily(h1))
    val dash = MarketDashboard.dashboard(latest, h1)
    val rows = dash.collect()
    assert(rows.map(_.getAs[String]("product_id")).distinct.length === rows.length)
    assert(rows.length === latest.count())
    // a trailing window over hourly candles can cover at most 25 buckets
    assert(rows.forall(r => r.getAs[Long]("n_candles_24h") <= 25L))
    val asOf = latest.agg(max("as_of")).head().getAs[java.time.LocalDateTime](0)
    val expVol = h1
      .filter(col("window_start") > lit(asOf).cast("timestamp_ntz") - expr("INTERVAL 24 HOURS"))
      .groupBy("product_id").agg(sum("volume").cast("decimal(18,8)").as("v"))
      .collect().map(r => r.getString(0) -> r.getDecimal(1)).toMap
    rows.foreach { r =>
      assert(r.getAs[java.math.BigDecimal]("volume_24h_trailing") ===
        expVol(r.getAs[String]("product_id")), r.getAs[String]("product_id"))
      // latest price sits inside the trailing high/low envelope only if
      // the last trade fell in a candle bucket — check envelope ordering
      assert(r.getAs[java.math.BigDecimal]("low_24h_trailing")
        .compareTo(r.getAs[java.math.BigDecimal]("high_24h_trailing")) <= 0)
    }
  }

  test("registers as a SQL view over a pipeline layout") {
    val out = java.nio.file.Files
      .createTempDirectory("graft-market-dash").toString
    PipelineRun.run(spark, sf, out)
    val view = MarketDashboard.register(spark, out)
    val viaSql = spark.sql(
      s"SELECT product_id, price, n_trades_24h FROM $view ORDER BY product_id")
      .collect()
    assert(viaSql.nonEmpty)
    // the view serves the same rollup the in-memory composition builds
    val direct = MarketDashboard.dashboard(
      spark.read.parquet(s"$out/price_latest"),
      spark.read.parquet(s"$out/ohlcv_1h"))
      .select("product_id", "price", "n_trades_24h")
      .orderBy("product_id").collect()
    assert(viaSql.map(_.toSeq).toSeq === direct.map(_.toSeq).toSeq)
    graft.operators.Serving.unregister(spark, Seq(view))
  }
}
