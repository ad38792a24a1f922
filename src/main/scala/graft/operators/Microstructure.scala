package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Market-microstructure metrics over staged trades — the TWAP and
  * order-flow rollups a trading mart serves next to the OHLCV candles
  * (the reference's marts stop at VWAP; these are the adjacent
  * time-weighted and side-split aggregations).
  *
  * Both are single-shuffle plans: TWAP adds one window pass (the lead
  * lookup rides the same (product, hour) shuffle as its group-by);
  * imbalance is a plain conditional aggregation with map-side partials.
  */
object Microstructure {

  /** Hourly time-weighted average price: each trade's price holds from
    * its own timestamp until the next trade in the hour (the last one
    * holds to the hour end), so
    * `twap = Σ price·hold_µs / Σ hold_µs`.
    *
    * Determinism: hold durations are exact integer MICROseconds
    * (`unix_micros` diffs — no date_diff truncation ambiguity);
    * price·hold is DECIMAL(18,8)×DECIMAL(20,0) → exact decimal, summed
    * exactly (order-independent), divided as double at the end. Ties on
    * trade_time are totally ordered by trade_id, so `lead` is
    * deterministic (a zero-duration hold for the earlier trade, which
    * is also the economically correct weight).
    *
    * Scale: ONE shuffle on (product_id, hour_bucket) serves both the
    * lead window and the aggregation; the reduce side sees
    * |products × hours| rows. */
  def twap1h(stg: DataFrame): DataFrame = {
    val w = Window.partitionBy("product_id", "hour_bucket")
      .orderBy("trade_time", "trade_id")
    stg
      .select(col("product_id"), col("hour_bucket"), col("trade_id"),
        col("trade_time"), col("price"))
      .withColumn("hold_us",
        unix_micros(coalesce(
          lead(col("trade_time"), 1).over(w),
          expr("timestampadd(HOUR, 1, hour_bucket)")).cast("timestamp")) -
          unix_micros(col("trade_time").cast("timestamp")))
      // hold cast is (19,0), NOT (20,0): price(18,8) x (20,0) would hit
      // Spark's precision-39 overflow rule and silently truncate the
      // product scale to 7; 18+19+1 = 38 keeps the multiply exact at
      // scale 8 (hold_us <= 3.6e9 fits 19 digits with room to spare)
      .withColumn("price_hold",
        (col("price") * col("hold_us").cast("decimal(19,0)"))
          .cast("decimal(38,8)"))
      .groupBy(col("product_id"), col("hour_bucket").as("window_start"))
      .agg(
        count(lit(1)).as("n_trades"),
        sum("hold_us").as("total_hold_us"),
        graft.functions.Rounding.roundScaled(
          sum("price_hold").cast("double") /
            nullif(sum("hold_us").cast("double"), lit(0.0d)), 8)
          .cast("decimal(18,8)").as("twap"))
  }

  /** Pairwise close-price correlation between products over hourly
    * candles — the cross-pair correlation matrix a crypto analytics
    * mart serves. For each unordered product pair (a < b), Pearson r
    * over the hours BOTH traded.
    *
    * Determinism: the three Pearson components
    * `n·Σxy − Σx·Σy`, `n·Σx² − (Σx)²`, `n·Σy² − (Σy)²` are computed in
    * EXACT decimal arithmetic (the anomaly-detector cancellation trick:
    * constant series cancel to literal zero), then one double division
    * + sqrt, rounded at 8 decimals to absorb the decimal→double
    * conversion ulp. Constant legs null the correlation via NULLIF.
    *
    * Scale: one shuffle co-partitions candles by hour for the
    * self-join, one more reduces to ‖pairs‖ rows. The intermediate is
    * ‖pairs × joint hours‖ — fine for a watchlist of products; for
    * thousands, pass a restricted `pairs` list: each leg is broadcast
    * LeftSemi-pruned to only the products that appear in the list
    * BEFORE the hour join, so the pair space collapses from
    * O(products²) to O(‖pairs‖) and the hour-join intermediate to
    * ‖restricted pairs × joint hours‖.
    *
    * `maxProductsUnlisted` is the no-watchlist valve: the unlisted
    * path is a genuine all-pairs matrix, so past this many distinct
    * products the run refuses loudly (pass `pairs`) instead of
    * shuffling O(products²) pair rows — the same measured-work
    * discipline as [[FuzzyJoin]]'s short bucket and
    * [[Dedup.ngramJaccard]]'s df cap. The count is one tiny
    * aggregate over the candle table's product column. */
  def pairCorrelation(h1: DataFrame,
                      pairs: Option[DataFrame] = None,
                      maxProductsUnlisted: Int = 200): DataFrame = {
    if (pairs.isEmpty) {
      val n = h1.select("product_id").distinct().count()
      require(n <= maxProductsUnlisted,
        s"pair_correlation without a pairs watchlist is all-pairs over " +
          s"$n products (${n * (n - 1) / 2} pairs, cap " +
          s"$maxProductsUnlisted products); pass `pairs` to restrict " +
          "the matrix or raise maxProductsUnlisted deliberately")
    }
    // Prune each leg to the products named in the watchlist (semi-join
    // against a broadcast of the tiny pair list), then keep only the
    // listed combinations after the hour join. The unordered contract
    // (a < b) is normalised here so callers may pass pairs either way.
    val normPairs = pairs.map { p =>
      p.select(
        least(col("product_a"), col("product_b")).as("product_a"),
        greatest(col("product_a"), col("product_b")).as("product_b"))
        .distinct()
    }
    val keepProducts = normPairs.map(p => broadcast(
      p.select(col("product_a").as("product_id"))
        .union(p.select(col("product_b").as("product_id"))).distinct()))
    val base = keepProducts match {
      case Some(keep) => h1.join(keep, Seq("product_id"), "left_semi")
      case None       => h1
    }
    val a = base.select(col("window_start"),
      col("product_id").as("product_a"), col("close").as("x"))
    val b = base.select(col("window_start"),
      col("product_id").as("product_b"), col("close").as("y"))
    val joined0 = a.join(b, "window_start")
      .filter(col("product_a") < col("product_b"))
    val joined = normPairs match {
      case Some(p) =>
        joined0.join(broadcast(p), Seq("product_a", "product_b"), "left_semi")
      case None => joined0
    }
    joined
      .withColumn("xy", (col("x") * col("y")).cast("decimal(38,16)"))
      .withColumn("xx", (col("x") * col("x")).cast("decimal(38,16)"))
      .withColumn("yy", (col("y") * col("y")).cast("decimal(38,16)"))
      .groupBy("product_a", "product_b")
      .agg(count(lit(1)).as("n_hours"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum("xy").as("sxy"), sum("xx").as("sxx"), sum("yy").as("syy"))
      // (19,8) sum casts: sized for Σ|close| per leg < ~3e10 (an (18,8)
      // cast would silently overflow→NULL at 1e10, inside plausible
      // envelopes); (19,8)x(19,8) stays exact decimal(38,16) in Spark
      .withColumn("num",
        col("n_hours").cast("decimal(6,0)") * col("sxy").cast("decimal(30,16)")
          - col("sx").cast("decimal(19,8)") * col("sy").cast("decimal(19,8)"))
      .withColumn("den_x",
        col("n_hours").cast("decimal(6,0)") * col("sxx").cast("decimal(30,16)")
          - col("sx").cast("decimal(19,8)") * col("sx").cast("decimal(19,8)"))
      .withColumn("den_y",
        col("n_hours").cast("decimal(6,0)") * col("syy").cast("decimal(30,16)")
          - col("sy").cast("decimal(19,8)") * col("sy").cast("decimal(19,8)"))
      .withColumn("corr",
        graft.functions.Rounding.roundScaled(
          col("num").cast("double") /
            nullif(sqrt(col("den_x").cast("double") *
              col("den_y").cast("double")), lit(0.0d)), 8))
      .select("product_a", "product_b", "n_hours", "corr")
  }

  /** Per-product-minute order-flow imbalance: buy vs sell volume split
    * from the trade side, `imbalance = (buy − sell) / (buy + sell)` —
    * the classic flow-pressure signal. Exact decimal side sums; the
    * ratio is an IEEE double of exact sums (size > 0 is a staging
    * invariant, so the denominator is never zero). One groupBy shuffle
    * with map-side partials. */
  def flowImbalance(stg: DataFrame): DataFrame =
    stg
      .groupBy(col("product_id"), col("minute_bucket").as("window_start"))
      .agg(
        sum(when(col("side") === "buy", col("size")).otherwise(lit(0)))
          .cast("decimal(18,8)").as("buy_volume"),
        sum(when(col("side") === "sell", col("size")).otherwise(lit(0)))
          .cast("decimal(18,8)").as("sell_volume"),
        sum(when(col("side") === "buy", 1L).otherwise(0L)).as("n_buys"),
        sum(when(col("side") === "sell", 1L).otherwise(0L)).as("n_sells"))
      .withColumn("imbalance",
        (col("buy_volume").cast("double") - col("sell_volume").cast("double")) /
          (col("buy_volume").cast("double") + col("sell_volume").cast("double")))

  /** Trades inside post-anomaly windows — the event-study slice every
    * surveillance/alerting mart serves ("what traded in the N minutes
    * from each price spike"): anomaly minutes from
    * [[Ohlcv.anomalyZscore]] open `windowMinutes`-wide half-open
    * intervals, trades land in them via [[RangeJoin.intervalJoin]]
    * (bucket-expansion equi-join — NEVER the nested-loop plan a raw
    * range predicate gets), then one rollup per window. Exact decimal
    * value sums; `first_trade_id` is a deterministic min. */
  def tradesDuringAnomalies(stg: DataFrame, m1: DataFrame,
                            windowMinutes: Int = 5,
                            zThresh: Double = 1.0d): DataFrame = {
    val anom = Ohlcv.anomalyZscore(m1, zThresh = zThresh)
      .filter(col("is_anomaly"))
      .select(col("product_id"), col("window_start").as("w_start"),
        (col("window_start") +
          expr(s"INTERVAL $windowMinutes MINUTES")).as("w_end"))
    RangeJoin.intervalJoin(anom,
        stg.select("product_id", "trade_id", "trade_time", "trade_value"),
        Seq("product_id"), "w_start", "w_end", "trade_time",
        bucketSeconds = windowMinutes.toLong * 60L)
      .groupBy(col("product_id"), col("w_start").as("window_start"))
      .agg(count(lit(1)).as("n_trades"),
        sum("trade_value").cast("decimal(18,8)").as("value_in_window"),
        min("trade_id").as("first_trade_id"))
      .orderBy("product_id", "window_start")
  }
}
