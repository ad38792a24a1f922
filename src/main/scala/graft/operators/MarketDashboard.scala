package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The market-dashboard rollup — the one table behind the reference's
  * second Grafana dashboard
  * (`monitoring/grafana/provisioning/dashboards/market-dashboard.json`:
  * per-product latest-price stats, 24h price-over-time, volume by
  * trading pair, latest-prices table). One row per product carries
  * every panel's numbers: the latest price + change percentages (the
  * stat tiles and the prices table, straight from [[PriceLatest]]) and
  * a TRAILING-24h candle rollup (open/high/low + volume + trade count
  * — the price-over-time summary and the volume bar chart; the
  * timeseries panel's full curve is the `ohlcv_1h` mart itself).
  *
  * Anchoring: the trailing window is `(as_of − 24h, as_of]` where
  * `as_of` is [[PriceLatest]]'s serving anchor (max trade time) —
  * deterministic and oracle-checkable, same stance as `price_latest`.
  *
  * Scale: the rollup aggregates the ‖products × 24 hours‖ candle
  * slice — broadcast-sized by construction — onto the ‖products‖
  * serving table; no fact-table work beyond the marts already built.
  */
object MarketDashboard {

  /** @param latest the [[PriceLatest.latest]] serving table;
    * @param h1 the 1-hour candle mart. */
  def dashboard(latest: DataFrame, h1: DataFrame): DataFrame = {
    val asOf = latest.agg(max("as_of").as("as_of"))
    val roll = h1.crossJoin(broadcast(asOf))
      .filter(col("window_start") > expr("timestampadd(HOUR, -24, as_of)"))
      .groupBy("product_id")
      .agg(
        min_by(col("open"), col("window_start")).as("open_24h"),
        max("high").as("high_24h_trailing"),
        min("low").as("low_24h_trailing"),
        sum("volume").cast("decimal(18,8)").as("volume_24h_trailing"),
        sum("trade_count").as("n_trades_24h"),
        count(lit(1)).as("n_candles_24h"))
    latest
      .join(broadcast(roll), Seq("product_id"), "left")
      .select(
        col("product_id"), col("price"), col("updated_at"),
        col("change_1h_pct"), col("change_24h_pct"),
        col("open_24h"), col("high_24h_trailing"),
        col("low_24h_trailing"), col("volume_24h_trailing"),
        col("n_trades_24h"), col("n_candles_24h"), col("as_of"))
  }

  /** Register the dashboard as a SQL view over a [[PipelineRun]]
    * layout — the Grafana datasource is a `spark.sql` reader (the
    * [[Serving]] pattern `pipeline_health` already follows). */
  def register(spark: SparkSession, outRoot: String,
               prefix: String = ""): String = {
    val view = prefix + "market_dashboard"
    dashboard(
      spark.read.parquet(s"$outRoot/price_latest"),
      spark.read.parquet(s"$outRoot/ohlcv_1h"))
      .createOrReplaceTempView(view)
    view
  }
}
