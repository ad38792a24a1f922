package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Daily OHLCV + return / volatility / drawdown metrics.
  *
  * Re-expresses `processing/dbt/models/marts/daily_metrics.sql:44-112`
  * as a single hash aggregation over the hourly candles (the reference's
  * FIRST_VALUE/LAST_VALUE + self-join pattern collapsed into
  * min_by/max_by — one shuffle instead of two, and no COLLECT_LIST:
  * the ratio metrics only need exact min/max/first/last, so nothing is
  * materialized per-group).
  *
  * Ratios are IEEE double arithmetic over exact decimal inputs, cast to
  * DECIMAL(18,8) — deterministic under any partitioning.
  */
object DailyMetrics {

  def daily(h1: DataFrame): DataFrame = {
    val d = h1
      .withColumn("date", to_date(col("window_start")))
      .groupBy("product_id", "date")
      .agg(
        min_by(col("open"), col("window_start")).as("open"),
        max("high").as("high"),
        min("low").as("low"),
        max_by(col("close"), col("window_start")).as("close"),
        sum("volume").cast("decimal(18,8)").as("total_volume"),
        sum("trade_count").as("total_trades"))
    def ratio(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      graft.functions.Rounding.roundScaled(num / nullif(den, lit(0.0d)), 8)
        .cast("decimal(18,8)")
    d.withColumn("daily_return",
        ratio(col("close").cast("double") - col("open").cast("double"),
              col("open").cast("double")))
      .withColumn("volatility",
        ratio(col("high").cast("double") - col("low").cast("double"),
              col("open").cast("double")))
      .withColumn("max_drawdown",
        ratio(col("high").cast("double") - col("low").cast("double"),
              col("high").cast("double")))
      .withColumn("_partition_month", trunc(col("date"), "month"))
  }
}
