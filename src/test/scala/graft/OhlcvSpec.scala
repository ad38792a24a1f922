package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{DailyMetrics, Ohlcv}

/** OHLCV candle semantics on a hand-crafted tape. */
class OhlcvSpec extends GraftSuite {
  import spark.implicits._

  // (trade_id, product, time, price, size): one product, two minutes.
  private lazy val stg = Seq(
    (1L, "X", "2024-01-01 10:00:05", "10.00000000", "2.00000000"),
    (2L, "X", "2024-01-01 10:00:30", "12.00000000", "1.00000000"),
    (3L, "X", "2024-01-01 10:00:59", "11.00000000", "1.00000000"),
    (4L, "X", "2024-01-01 10:01:10", "11.50000000", "4.00000000"))
    .toDF("trade_id", "product_id", "ts", "price", "size")
    .select(col("trade_id"), col("product_id"),
      col("ts").cast("timestamp_ntz").as("trade_time"),
      col("price").cast("decimal(18,8)").as("price"),
      col("size").cast("decimal(18,8)").as("size"))
    .withColumn("trade_value",
      (col("price").cast("double") * col("size").cast("double"))
        .cast("decimal(18,8)"))
    .withColumn("minute_bucket",
      date_trunc("minute", col("trade_time")).cast("timestamp_ntz"))

  test("1m candle: open=first, close=last, high/low/vwap exact") {
    val m1 = Ohlcv.ohlcv1m(stg).filter(
      col("window_start") === lit(Timestamp.valueOf("2024-01-01 10:00:00"))
        .cast("timestamp_ntz"))
    val r = m1.head()
    assert(r.getAs[java.math.BigDecimal]("open").doubleValue() === 10.0)
    assert(r.getAs[java.math.BigDecimal]("close").doubleValue() === 11.0)
    assert(r.getAs[java.math.BigDecimal]("high").doubleValue() === 12.0)
    assert(r.getAs[java.math.BigDecimal]("low").doubleValue() === 10.0)
    assert(r.getAs[Long]("trade_count") === 3L)
    // vwap = (20 + 12 + 11) / 4
    assert(r.getAs[java.math.BigDecimal]("vwap").doubleValue() === 10.75)
  }

  test("1h rollup preserves totals and takes open/close from edge minutes") {
    val h1 = Ohlcv.ohlcv1h(Ohlcv.ohlcv1m(stg))
    val r = h1.head()
    assert(h1.count() === 1)
    assert(r.getAs[java.math.BigDecimal]("open").doubleValue() === 10.0)
    assert(r.getAs[java.math.BigDecimal]("close").doubleValue() === 11.5)
    assert(r.getAs[Long]("trade_count") === 4L)
    assert(r.getAs[java.math.BigDecimal]("volume").doubleValue() === 8.0)
  }

  test("daily metrics ratios from exact aggregates") {
    val dm = DailyMetrics.daily(Ohlcv.ohlcv1h(Ohlcv.ohlcv1m(stg)))
    val r = dm.head()
    // return = (11.5 - 10) / 10; volatility = (12 - 10) / 10; dd = 2 / 12
    assert(r.getAs[java.math.BigDecimal]("daily_return").doubleValue() === 0.15)
    assert(r.getAs[java.math.BigDecimal]("volatility").doubleValue() === 0.2)
    assert(math.abs(r.getAs[java.math.BigDecimal]("max_drawdown").doubleValue()
      - 2.0 / 12.0) < 1e-8)
  }

  test("rolling metrics: time-RANGE frame expires candles older than 15m") {
    // candles at 10:00, 10:01, 10:20 — the 10:20 frame must contain
    // ONLY itself (gap > 15m), not the two earlier candles.
    val tape = Seq(
      (1L, "X", "2024-01-01 10:00:05", "10.00000000", "1.00000000"),
      (2L, "X", "2024-01-01 10:01:05", "20.00000000", "1.00000000"),
      (3L, "X", "2024-01-01 10:20:05", "40.00000000", "1.00000000"))
      .toDF("trade_id", "product_id", "ts", "price", "size")
      .select(col("trade_id"), col("product_id"),
        col("ts").cast("timestamp_ntz").as("trade_time"),
        col("price").cast("decimal(18,8)").as("price"),
        col("size").cast("decimal(18,8)").as("size"))
      .withColumn("trade_value",
        (col("price").cast("double") * col("size").cast("double"))
          .cast("decimal(18,8)"))
      .withColumn("minute_bucket",
        date_trunc("minute", col("trade_time")).cast("timestamp_ntz"))
    val roll = Ohlcv.rolling(Ohlcv.ohlcv1m(tape))
    val byMin = roll.collect()
      .map(r => r.getAs[java.time.LocalDateTime]("window_start").toString -> r)
      .toMap
    val atStart = byMin("2024-01-01T10:00")
    assert(atStart.getAs[Long]("n_candles") === 1L)
    assert(atStart.getAs[Double]("ma_close") === 10.0)
    val at1 = byMin("2024-01-01T10:01")
    assert(at1.getAs[Long]("n_candles") === 2L)
    assert(at1.getAs[Double]("ma_close") === 15.0)
    assert(at1.getAs[java.math.BigDecimal]("roll_high").doubleValue() === 20.0)
    val at20 = byMin("2024-01-01T10:20")
    assert(at20.getAs[Long]("n_candles") === 1L)
    assert(at20.getAs[Double]("ma_close") === 40.0)
    assert(at20.getAs[java.math.BigDecimal]("roll_low").doubleValue() === 40.0)
  }

  private def tape3(prices: Seq[(String, Double)]): org.apache.spark.sql.DataFrame =
    prices.zipWithIndex.map { case ((t, p), i) => (i.toLong, "X", t, p, 1.0d) }
      .toDF("trade_id", "product_id", "ts", "p", "s")
      .select(col("trade_id"), col("product_id"),
        col("ts").cast("timestamp_ntz").as("trade_time"),
        col("p").cast("decimal(18,8)").as("price"),
        col("s").cast("decimal(18,8)").as("size"))
      .withColumn("trade_value",
        (col("price").cast("double") * col("size").cast("double"))
          .cast("decimal(18,8)"))
      .withColumn("minute_bucket",
        date_trunc("minute", col("trade_time")).cast("timestamp_ntz"))

  test("ewma: α=1/2 weights over the candle frame, exact on clean powers") {
    val m1 = Ohlcv.ohlcv1m(tape3(Seq(
      "2024-01-01 10:00:05" -> 10.0, "2024-01-01 10:01:05" -> 20.0,
      "2024-01-01 10:02:05" -> 40.0)))
    val rows = Ohlcv.ewma(m1).orderBy("window_start").collect()
    // n=1: ewma = close
    assert(rows(0).getAs[java.math.BigDecimal]("ewma_close")
      .doubleValue() === 10.0)
    // n=2: (20 + 10·0.5) / 1.5, rounded to 8
    assert(math.abs(rows(1).getAs[java.math.BigDecimal]("ewma_close")
      .doubleValue() - 25.0 / 1.5) < 1e-8)
    // n=3: (40 + 20·0.5 + 10·0.25) / 1.75 = 52.5 / 1.75 = 30
    assert(rows(2).getAs[java.math.BigDecimal]("ewma_close")
      .doubleValue() === 30.0)
    assert(rows(2).getAs[Long]("n_candles") === 3L)
    // span valve: the exact-weight scale caps at 16
    intercept[IllegalArgumentException] { Ohlcv.ewma(m1, span = 17) }
  }

  test("rsi: Cutler's SMA form over exact decimal diffs; null edges") {
    val m1 = Ohlcv.ohlcv1m(tape3(Seq(
      "2024-01-01 10:00:05" -> 10.0, "2024-01-01 10:01:05" -> 20.0,
      "2024-01-01 10:02:05" -> 15.0)))
    val rows = Ohlcv.rsi(m1).orderBy("window_start").collect()
    // first candle: no prior change
    assert(rows(0).isNullAt(rows(0).fieldIndex("rsi")))
    assert(rows(0).getAs[Long]("n_changes") === 0L)
    // +10 only: all gain
    assert(rows(1).getAs[Double]("rsi") === 100.0)
    // +10, -5: 100·10/15
    assert(math.abs(rows(2).getAs[Double]("rsi") - 100.0 * 10 / 15) < 1e-7)
    assert(rows(2).getAs[Long]("n_changes") === 2L)

    // zero total movement → null (not divide-by-zero)
    val flat = Ohlcv.rsi(Ohlcv.ohlcv1m(tape3(Seq(
      "2024-01-01 10:00:05" -> 10.0, "2024-01-01 10:01:05" -> 10.0))))
      .orderBy("window_start").collect()
    assert(flat(1).isNullAt(flat(1).fieldIndex("rsi")))
  }

  test("gap fill: dense spine, forward-filled close, zeroed volume") {
    val m1 = Ohlcv.ohlcv1m(tape3(Seq(
      "2024-01-01 10:00:05" -> 10.0, "2024-01-01 10:03:05" -> 20.0)))
    val filled = Ohlcv.gapFill(m1).collect()
      .map(r => r.getAs[java.time.LocalDateTime]("window_start").toString -> r)
      .toMap
    assert(filled.size === 4) // 10:00..10:03 inclusive
    val gap = filled("2024-01-01T10:01")
    assert(gap.getAs[Boolean]("is_gap"))
    assert(gap.getAs[java.math.BigDecimal]("close_filled").doubleValue() === 10.0)
    assert(gap.getAs[java.math.BigDecimal]("volume").doubleValue() === 0.0)
    assert(gap.getAs[Long]("trade_count") === 0L)
    val real = filled("2024-01-01T10:03")
    assert(!real.getAs[Boolean]("is_gap"))
    assert(real.getAs[java.math.BigDecimal]("close_filled").doubleValue() === 20.0)
  }

  test("zscore anomaly: spike flagged, constant frame yields null z") {
    val m1 = Ohlcv.ohlcv1m(tape3(Seq(
      "2024-01-01 10:00:05" -> 10.0, "2024-01-01 10:01:05" -> 10.0,
      "2024-01-01 10:02:05" -> 10.0, "2024-01-01 10:03:05" -> 10.0,
      "2024-01-01 10:04:05" -> 10.0, "2024-01-01 10:05:05" -> 60.0)))
    val rows = Ohlcv.anomalyZscore(m1).collect()
      .map(r => r.getAs[java.time.LocalDateTime]("window_start").toString -> r)
      .toMap
    // constant 5-candle prefix: sd 0 -> z NULL -> not anomalous
    val flat = rows("2024-01-01T10:04")
    assert(flat.getAs[Double]("sd_close") === 0.0)
    assert(flat.isNullAt(flat.fieldIndex("zscore")))
    assert(!flat.getAs[Boolean]("is_anomaly"))
    // spike: mean 110/6, var 4100/6 - mean^2, z ~ 2.236 > 2
    val spike = rows("2024-01-01T10:05")
    assert(spike.getAs[Double]("zscore") > 2.0)
    assert(spike.getAs[Boolean]("is_anomaly"))
  }
}
