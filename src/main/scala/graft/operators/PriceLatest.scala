package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-price serving table with multi-horizon change percentages.
  *
  * Re-expresses `processing/dbt/models/marts/price_latest.sql:12-93`.
  * The reference anchors its windows to CURRENT_TIMESTAMP; here every
  * window is anchored to the max trade_time in the data ("as-of" time),
  * which makes the result deterministic and oracle-checkable while
  * keeping the semantics (serving-time snapshot) identical.
  *
  * Scale: the per-product "latest" pick is a row_number window over the
  * product hash partitioning (small state); the three horizon lookups
  * produce ≤ |products| rows each and join back via broadcast — no
  * fact-table shuffle beyond the candle aggregations already built.
  */
object PriceLatest {

  private def pctChange(cur: Column, prev: Column): Column =
    graft.functions.Rounding.roundScaled(
      (cur.cast("double") - coalesce(prev, cur).cast("double")) /
        nullif(prev.cast("double"), lit(0.0d)) * 100.0d, 4)
      .cast("decimal(10,4)")

  /** Per-product latest trade (price + time + id). The trade_id rides
    * along as the deterministic tie-break so the table can be MERGED
    * incrementally: keep-max by (updated_at, trade_id) over old state ∪
    * a new batch's latest reproduces this exactly
    * ([[PipelineRun.runIncremental]] maintains it as a state table). */
  def latestTradeOf(stg: DataFrame): DataFrame =
    stg
      .withColumn("rn", row_number().over(
        Window.partitionBy("product_id")
          .orderBy(col("trade_time").desc, col("trade_id").desc)))
      .filter(col("rn") === 1)
      .select(col("product_id"), col("price"),
        col("trade_time").as("updated_at"), col("trade_id"))

  /** @param stg staging trades; @param m1 1-minute candles;
    * @param h1 1-hour candles; @param dm daily metrics. */
  def latest(stg: DataFrame, m1: DataFrame, h1: DataFrame, dm: DataFrame): DataFrame =
    serve(latestTradeOf(stg), m1, h1, dm)

  /** Build the serving table from a materialized latest-trade state
    * table plus the candle marts. as-of = max(updated_at) over the
    * state — identical to max trade_time over all of staging, but
    * computable from |products| rows. The candle inputs only need the
    * last ~25 h before as-of (the widest horizon), so an incremental
    * caller passes partition-pruned slices and the result is still
    * exact. */
  def serve(latestTrade: DataFrame, m1: DataFrame, h1: DataFrame,
            dm: DataFrame): DataFrame = {
    val asOf = latestTrade.agg(max("updated_at").as("as_of"))

    // Previous candle per horizon: 2nd-latest window_start within the
    // anchored lookback (reference's QUALIFY rn = 2).
    def prevCandle(candles: DataFrame, valueCol: String, outName: String,
                   lookback: String): DataFrame =
      candles.crossJoin(broadcast(asOf))
        .filter(col("window_start") >= expr(s"timestampadd($lookback, as_of)"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("product_id").orderBy(col("window_start").desc)))
        .filter(col("rn") === 2)
        .select(col("product_id"), col(valueCol).as(outName))

    val prev1m = prevCandle(m1, "close", "price_1m_ago", "MINUTE, -2")
    val prev1h = prevCandle(h1, "close", "price_1h_ago", "HOUR, -2")

    val prev24h = dm.crossJoin(broadcast(asOf))
      .filter(col("date") === expr("date_add(to_date(as_of), -1)"))
      .select(col("product_id"), col("open").as("price_24h_ago"),
        col("high").as("high_24h"), col("low").as("low_24h"),
        col("total_volume").as("volume_24h"))

    latestTrade.drop("trade_id")
      .join(broadcast(prev1m), Seq("product_id"), "left")
      .join(broadcast(prev1h), Seq("product_id"), "left")
      .join(broadcast(prev24h), Seq("product_id"), "left")
      .crossJoin(broadcast(asOf))
      .select(
        col("product_id"),
        col("price"),
        col("updated_at"),
        pctChange(col("price"), col("price_1m_ago")).as("change_1m_pct"),
        pctChange(col("price"), col("price_1h_ago")).as("change_1h_pct"),
        pctChange(col("price"), col("price_24h_ago")).as("change_24h_pct"),
        col("high_24h"), col("low_24h"), col("volume_24h"),
        col("as_of"))
  }
}
