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
  /** Trailing time-RANGE frame over candles: partition by product,
    * order by epoch seconds (NTZ has no direct long cast; NTZ→LTZ is
    * value-preserving in the UTC session and LTZ→long is epoch seconds
    * = DuckDB `epoch()`), last `minutes` minutes inclusive. Shared by
    * [[rolling]] and [[anomalyZscore]] so their frames cannot drift
    * from each other or the oracle's 840-PRECEDING constant. */
  private def trailingWindow(minutes: Int) =
    Window.partitionBy("product_id")
      .orderBy(col("window_start").cast("timestamp").cast("long"))
      .rangeBetween(-(minutes - 1) * 60L, 0L)

  def rolling(m1: DataFrame, minutes: Int = 15): DataFrame = {
    val w = trailingWindow(minutes)
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

  /** Exponentially-weighted moving average of the close over the last
    * `span` candles (α = 1/2): `ewma = Σ close_k·w_k / Σ w_k` with
    * `w_k = 2^-k` over the frame ordered newest-first — the smoothing
    * line charting/TA consumers draw next to [[rolling]]'s plain MA.
    *
    * Determinism (the cross-engine stance of twap/vwap): numerator and
    * denominator are both scaled by 2^(span-1), making every weight an
    * exact INTEGER `2^(15-k)` (shifted long, never libm `pow`) — each
    * `close·w` term is an exact DECIMAL(24,8) product, summed exactly
    * (order-free) with NO scale-reducing decimal cast anywhere
    * (Spark's decimal downcast rounds HALF_UP, DuckDB's truncates —
    * observed diverging on a scale-10 tie); the sum's unscaled value
    * stays under 2^53 so the decimal→double cast is one
    * correctly-rounded divide in both engines; the scaled normalizer
    * `2^16 - 2^(16-n)` is an exact integer double; one final double
    * divide is rounded to 8. The per-row fold is a frame
    * `collect_list` + `aggregate` — codegen'd expressions over ≤
    * `span` elements, no UDF.
    *
    * Scale: ONE shuffle on product_id serves the window; state per row
    * is the ≤ `span`-element frame list. */
  def ewma(m1: DataFrame, span: Int = 16): DataFrame = {
    require(span >= 1 && span <= 16,
      "span beyond 16 overflows the exact integer weight scaling")
    val w = Window.partitionBy("product_id").orderBy("window_start")
      .rowsBetween(-(span - 1), 0)
    m1.select(col("product_id"), col("window_start"), col("close"),
        collect_list(col("close")).over(w).as("cl"))
      // Σ close_i · 2^(15-k): weight exponent for 0-based index i in an
      // n-element frame (current row last, k = n-1-i) is i + 16 - n
      .withColumn("num", expr("""
        aggregate(
          transform(cl, (c, i) ->
            CAST(CAST(c AS DECIMAL(18,8)) *
                 CAST(shiftleft(1L, i + 16 - size(cl)) AS DECIMAL(5,0))
              AS DECIMAL(24,8))),
          CAST(0 AS DECIMAL(30,8)),
          (acc, x) -> CAST(acc + x AS DECIMAL(30,8)))"""))
      .withColumn("den", expr(
        "CAST(shiftleft(1L, 16) - shiftleft(1L, 16 - size(cl)) AS DOUBLE)"))
      .select(col("product_id"), col("window_start"), col("close"),
        size(col("cl")).cast("long").as("n_candles"),
        graft.functions.Rounding.roundScaled(
          col("num").cast("double") / col("den"), 8)
          .cast("decimal(18,8)").as("ewma_close"))
  }

  /** Cutler's RSI over the last `period` close-to-close changes:
    * `rsi = 100·Σgain / (Σgain + Σloss)` — the SMA form (Wilder's
    * recursive smoothing is order-dependent float state; Cutler's is
    * the standard deterministic variant). Gains/losses are EXACT
    * decimal diffs of DECIMAL(18,8) closes, frame-summed exactly
    * (order-free); one final double divide rounded to 8. A row with no
    * prior change (first candle) or zero total movement yields NULL,
    * per the indicator's convention. Same single product_id shuffle as
    * the other candle windows — the lag and the frame sums share it. */
  def rsi(m1: DataFrame, period: Int = 14): DataFrame = {
    require(period >= 1, "rsi needs a positive period")
    val ord = Window.partitionBy("product_id").orderBy("window_start")
    val frame = ord.rowsBetween(-(period - 1), 0)
    m1.select(col("product_id"), col("window_start"), col("close"))
      .withColumn("diff",
        (col("close") - lag(col("close"), 1).over(ord))
          .cast("decimal(19,8)"))
      .withColumn("gain", greatest(col("diff"),
        lit(0).cast("decimal(19,8)")))
      .withColumn("loss", greatest(-col("diff"),
        lit(0).cast("decimal(19,8)")))
      .select(col("product_id"), col("window_start"), col("close"),
        count(col("diff")).over(frame).as("n_changes"),
        sum(col("gain")).over(frame).as("sg"),
        sum(col("loss")).over(frame).as("sl"))
      .select(col("product_id"), col("window_start"), col("close"),
        col("n_changes"),
        graft.functions.Rounding.roundScaled(
          lit(100.0d) * col("sg").cast("double") /
            nullif((col("sg") + col("sl")).cast("double"), lit(0.0d)),
          8).as("rsi"))
  }

  /** Candle gap filling: emit a complete per-product minute spine from
    * the product's first to last candle, forward-filling the close over
    * empty minutes (volume/trade_count zero) — the densification step
    * charting and TA consumers need, since minutes with no trades
    * produce no candle at all.
    *
    * Plan: per-product bounds reduce to ‖products‖ rows, the spine is
    * a narrow `sequence`+`explode` fan-out of those rows (never a
    * driver-side loop), one shuffle joins candles onto the spine, and
    * one more orders each product run for the forward-fill window.
    * Spine size is ‖products × minutes of trading span‖ — independent
    * of trade volume, so the fan-out stays small at 100 TB of trades. */
  def gapFill(m1: DataFrame): DataFrame = {
    val spine = m1.groupBy("product_id")
      .agg(min("window_start").as("mn"), max("window_start").as("mx"))
      .select(col("product_id"),
        explode(expr("sequence(mn, mx, interval 1 minute)")).as("window_start"))
    val w = Window.partitionBy("product_id").orderBy("window_start")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    spine
      .join(m1.select("product_id", "window_start", "close", "volume",
        "trade_count"), Seq("product_id", "window_start"), "left")
      .select(col("product_id"), col("window_start"),
        col("close").isNull.as("is_gap"),
        last(col("close"), ignoreNulls = true).over(w).as("close_filled"),
        coalesce(col("volume"), lit(0).cast("decimal(18,8)")).as("volume"),
        coalesce(col("trade_count"), lit(0L)).as("trade_count"))
  }

  /** Rolling z-score anomaly detection over 1-minute candles: flag
    * closes more than `zThresh` trailing-window standard deviations
    * from the trailing mean — the price-spike monitor a trading mart
    * serves.
    *
    * Determinism: the variance numerator `n·Σx² − (Σx)²` is computed
    * ENTIRELY in exact decimal arithmetic (frame sums are associative,
    * so engine frame-summation order is irrelevant, and the
    * catastrophic cancellation of E[x²]−mean² happens exactly — a
    * constant frame yields literal zero, not a ±1e-12 FP residue whose
    * sign differs per engine). Only the final double conversion of
    * that numerator is inexact, and since Σx² exceeds 2^53 unscaled it
    * can differ by 1 ulp RELATIVE between engines — sd is rounded at 8
    * decimals ([[graft.functions.Rounding.roundScaled]], the DuckDB
    * round algorithm) to absorb it, making the z-score division
    * bit-identical. Zero variance nulls the z-score via NULLIF.
    *
    * Scale: same single product_id shuffle + one Window operator as
    * [[rolling]]; input is candle rows, not trades. */
  def anomalyZscore(m1: DataFrame, minutes: Int = 15,
                    zThresh: Double = 2.0d): DataFrame = {
    val w = trailingWindow(minutes)
    m1.select(col("product_id"), col("window_start"), col("close"),
        (col("close") * col("close")).cast("decimal(38,16)").as("close_sq"))
      .select(col("product_id"), col("window_start"), col("close"),
        count(lit(1)).over(w).as("n_candles"),
        sum("close").over(w).as("close_sum"),
        sum("close_sq").over(w).as("sq_sum"))
      .withColumn("mean_close",
        col("close_sum").cast("double") / col("n_candles").cast("double"))
      // exact decimal cancellation; casts sized for price<~3e6, n<1e4
      .withColumn("var_num",
        col("n_candles").cast("decimal(4,0)") *
          col("sq_sum").cast("decimal(30,16)") -
          col("close_sum").cast("decimal(18,8)") *
          col("close_sum").cast("decimal(18,8)"))
      .withColumn("var_close",
        col("var_num").cast("double") /
          (col("n_candles").cast("double") * col("n_candles").cast("double")))
      .withColumn("sd_close",
        graft.functions.Rounding.roundScaled(
          sqrt(greatest(col("var_close"), lit(0.0d))), 8))
      .withColumn("zscore",
        (col("close").cast("double") - col("mean_close")) /
          nullif(col("sd_close"), lit(0.0d)))
      .withColumn("is_anomaly",
        coalesce(abs(col("zscore")) > zThresh, lit(false)))
      .select("product_id", "window_start", "close", "n_candles",
        "mean_close", "sd_close", "zscore", "is_anomaly")
  }
}
