package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** OHLCV candle aggregation.
  *
  * The reference computes open/close with FIRST_VALUE/LAST_VALUE window
  * functions and then joins that back onto the trades before grouping
  * (`processing/dbt/models/marts/ohlcv_1m.sql:27-91`) — correct, but it
  * shuffles the fact table twice. Spark-first, `min_by`/`max_by` inside
  * the same `groupBy` computes open/close/high/low/volume/vwap in ONE
  * hash aggregation with map-side partials: a single shuffle of already
  * partially-combined data, which is the plan that survives a 100 TB
  * fact table (the reduce side sees |products × minutes| rows, not
  * |trades|).
  *
  * Tie-breaks: (trade_time, trade_id) is a total order, so open/close
  * are deterministic even with same-timestamp trades.
  *
  * VWAP: decimal sums (exact, order-independent) divided in double, cast
  * to DECIMAL(18,8) — deterministic under any partitioning.
  */
object Ohlcv {

  /** 1-minute candles from staging trades (`ohlcv_1m.sql:27-91`). */
  def ohlcv1m(stg: DataFrame): DataFrame =
    stg.groupBy(col("product_id"), col("minute_bucket").as("window_start"))
      .agg(
        min_by(col("price"), struct(col("trade_time"), col("trade_id"))).as("open"),
        max("price").as("high"),
        min("price").as("low"),
        max_by(col("price"), struct(col("trade_time"), col("trade_id"))).as("close"),
        sum("size").cast("decimal(18,8)").as("volume"),
        count(lit(1)).as("trade_count"),
        graft.functions.Rounding.roundScaled(
          sum("trade_value").cast("double") /
            nullif(sum("size").cast("double"), lit(0.0d)), 8)
          .cast("decimal(18,8)").as("vwap"))
      .withColumn("window_end",
        expr("timestampadd(MINUTE, 1, window_start)"))
      .withColumn("_partition_date", to_date(col("window_start")))

  /** 1-hour candles rolled up from 1-minute candles
    * (`ohlcv_1h.sql:27-92`). Open/close come from the first/last minute
    * candle (window_start is unique per product-hour, so single-key
    * min_by/max_by is deterministic); vwap is volume-weighted from the
    * minute vwaps, with the weighted terms made exact as DECIMAL(30,10)
    * before the order-independent sum. */
  def ohlcv1h(m1: DataFrame): DataFrame =
    m1.withColumnRenamed("window_start", "minute_start")
      .withColumn("hour_start",
        date_trunc("hour", col("minute_start")).cast("timestamp_ntz"))
      .withColumn("vwap_vol",
        (col("vwap").cast("double") * col("volume").cast("double"))
          .cast("decimal(30,10)"))
      .groupBy(col("product_id"), col("hour_start"))
      .agg(
        min_by(col("open"), col("minute_start")).as("open"),
        max("high").as("high"),
        min("low").as("low"),
        max_by(col("close"), col("minute_start")).as("close"),
        sum("volume").cast("decimal(18,8)").as("volume"),
        sum("trade_count").as("trade_count"),
        graft.functions.Rounding.roundScaled(
          sum("vwap_vol").cast("double") /
            nullif(sum("volume").cast("double"), lit(0.0d)), 8)
          .cast("decimal(18,8)").as("vwap"))
      .withColumnRenamed("hour_start", "window_start")
      .withColumn("window_end", expr("timestampadd(HOUR, 1, window_start)"))
      .withColumn("_partition_date", to_date(col("window_start")))

  /** Trailing-window rolling metrics over 1-minute candles: moving
    * average close, rolling high/low, and rolling volume over the last
    * `minutes` of TIME (a RANGE frame on epoch seconds, not a row
    * count — minutes with no trades produce no candle, so a ROWS frame
    * would silently stretch across gaps).
    *
    * Determinism: the moving average is an exact decimal SUM over the
    * frame divided by the frame count in double — engines disagree on
    * frame summation order (Spark rebuilds sliding frames, DuckDB uses
    * segment trees) but decimal addition is associative, so the sums
    * are bit-identical; min/max/count are order-free.
    *
    * Scale: one shuffle on product_id; within a partition Spark
    * maintains the sliding RANGE frame incrementally over the sorted
    * run. Input is |products × minutes| candle rows (already reduced
    * from trades), so the window never sees raw fact-table volume. */
  def rolling(m1: DataFrame, minutes: Int = 15): DataFrame = {
    // NTZ has no direct long cast; NTZ->LTZ is value-preserving in the
    // UTC session, and LTZ->long is epoch seconds (= DuckDB epoch()).
    val w = Window.partitionBy("product_id")
      .orderBy(col("window_start").cast("timestamp").cast("long"))
      .rangeBetween(-(minutes - 1) * 60L, 0L)
    // all five frame aggregates in ONE select => one Window operator,
    // one sort (chained withColumn would stack a Window+Sort per metric)
    m1.select(col("product_id"), col("window_start"), col("close"),
        count(lit(1)).over(w).as("n_candles"),
        sum("close").over(w).as("close_sum"),
        max("high").over(w).as("roll_high"),
        min("low").over(w).as("roll_low"),
        sum("volume").over(w).cast("decimal(18,8)").as("roll_volume"))
      .withColumn("ma_close",
        col("close_sum").cast("double") / col("n_candles").cast("double"))
      .select("product_id", "window_start", "close", "n_candles", "ma_close",
        "roll_high", "roll_low", "roll_volume")
  }
}
