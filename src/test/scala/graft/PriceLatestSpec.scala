package graft

import org.apache.spark.sql.functions._

import graft.operators.{DailyMetrics, Ohlcv, PriceLatest}

/** price_latest horizon semantics on a crafted two-day tape. */
class PriceLatestSpec extends GraftSuite {
  import spark.implicits._

  private lazy val stg = Seq(
    // day 1: open 100, close 110
    (1L, "2024-01-01 09:00:00", "100.00000000"),
    (2L, "2024-01-01 10:00:00", "110.00000000"),
    // day 2: 09:58 close 120, 09:59 close 130, 10:00 close 140 (latest)
    (3L, "2024-01-02 09:58:00", "120.00000000"),
    (4L, "2024-01-02 09:59:10", "125.00000000"),
    (5L, "2024-01-02 09:59:40", "130.00000000"),
    (6L, "2024-01-02 10:00:30", "140.00000000"))
    .toDF("trade_id", "ts", "price")
    .select(col("trade_id"), lit("X").as("product_id"),
      col("ts").cast("timestamp_ntz").as("trade_time"),
      col("price").cast("decimal(18,8)").as("price"),
      lit("1.00000000").cast("decimal(18,8)").as("size"))
    .withColumn("trade_value",
      (col("price").cast("double") * col("size").cast("double"))
        .cast("decimal(18,8)"))
    .withColumn("minute_bucket",
      date_trunc("minute", col("trade_time")).cast("timestamp_ntz"))

  test("previous-candle horizons and change percentages") {
    val m1 = Ohlcv.ohlcv1m(stg)
    val h1 = Ohlcv.ohlcv1h(m1)
    val dm = DailyMetrics.daily(h1)
    val r = PriceLatest.latest(stg, m1, h1, dm).head()

    assert(r.getAs[java.math.BigDecimal]("price").doubleValue() === 140.0)
    // 1m ago = close of the SECOND-latest minute candle in the 2-min
    // window (09:59 -> 130): (140-130)/130*100 = 7.6923
    assert(r.getAs[java.math.BigDecimal]("change_1m_pct").doubleValue() === 7.6923)
    // 1h ago = close of the second-latest hour candle (09:00 -> 130)
    assert(r.getAs[java.math.BigDecimal]("change_1h_pct").doubleValue() === 7.6923)
    // 24h ago = previous day's OPEN (100): +40%
    assert(r.getAs[java.math.BigDecimal]("change_24h_pct").doubleValue() === 40.0)
    assert(r.getAs[java.math.BigDecimal]("high_24h").doubleValue() === 110.0)
    assert(r.getAs[java.math.BigDecimal]("volume_24h").doubleValue() === 2.0)
  }

  test("missing horizons yield null changes, not errors") {
    // only one trade: no rn=2 candle in any window, no previous day
    val single = stg.filter(col("trade_id") === 6L)
    val m1 = Ohlcv.ohlcv1m(single)
    val h1 = Ohlcv.ohlcv1h(m1)
    val r = PriceLatest.latest(single, m1, h1, DailyMetrics.daily(h1)).head()
    assert(r.isNullAt(r.fieldIndex("change_1m_pct")))
    assert(r.isNullAt(r.fieldIndex("change_24h_pct")))
    assert(r.getAs[java.math.BigDecimal]("price").doubleValue() === 140.0)
  }
}
