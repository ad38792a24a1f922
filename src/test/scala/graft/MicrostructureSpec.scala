package graft

import org.apache.spark.sql.functions._

import graft.operators.Microstructure

/** TWAP and order-flow imbalance semantics on crafted tapes. */
class MicrostructureSpec extends GraftSuite {
  import spark.implicits._

  test("twap weights each price by its hold time until the next trade") {
    // holds: 30min @10, 15min @20, 15min @40 (to hour end) -> twap 20
    val stg = Seq(
      (1L, "X", "2024-01-01 10:00:00", "10.00000000"),
      (2L, "X", "2024-01-01 10:30:00", "20.00000000"),
      (3L, "X", "2024-01-01 10:45:00", "40.00000000"))
      .toDF("trade_id", "product_id", "tt", "p")
      .select(col("trade_id"), col("product_id"),
        col("tt").cast("timestamp_ntz").as("trade_time"),
        col("p").cast("decimal(18,8)").as("price"))
      .withColumn("hour_bucket",
        date_trunc("hour", col("trade_time")).cast("timestamp_ntz"))
    val r = Microstructure.twap1h(stg).head()
    assert(r.getAs[Long]("n_trades") === 3L)
    assert(r.getAs[Long]("total_hold_us") === 3600L * 1000000L)
    assert(r.getAs[java.math.BigDecimal]("twap").doubleValue() === 20.0)
  }

  test("twap tie on trade_time gives the earlier trade a zero hold") {
    val stg = Seq(
      (1L, "X", "2024-01-01 10:00:00", "10.00000000"),
      (2L, "X", "2024-01-01 10:00:00", "30.00000000")) // same instant
      .toDF("trade_id", "product_id", "tt", "p")
      .select(col("trade_id"), col("product_id"),
        col("tt").cast("timestamp_ntz").as("trade_time"),
        col("p").cast("decimal(18,8)").as("price"))
      .withColumn("hour_bucket",
        date_trunc("hour", col("trade_time")).cast("timestamp_ntz"))
    val r = Microstructure.twap1h(stg).head()
    // trade 1 holds 0µs; trade 2 holds the whole hour -> twap = 30
    assert(r.getAs[java.math.BigDecimal]("twap").doubleValue() === 30.0)
  }

  test("pair correlation: linear legs r=1, inverted r=-1, constant null") {
    // product A: 10,20,30; B = 2*A -> r=1; C = 40-A -> r=-1; D constant
    val rows = Seq("2024-01-01 10:00:00", "2024-01-01 11:00:00",
      "2024-01-01 12:00:00").zip(Seq(10.0, 20.0, 30.0)).flatMap {
      case (ts, v) => Seq(("A", ts, v), ("B", ts, 2 * v),
        ("C", ts, 40 - v), ("D", ts, 7.0))
    }
    val h1 = rows.toDF("product_id", "ts", "c")
      .select(col("product_id"),
        col("ts").cast("timestamp_ntz").as("window_start"),
        col("c").cast("decimal(18,8)").as("close"))
    val got = Microstructure.pairCorrelation(h1).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.getAs[Any]("corr")).map(_.asInstanceOf[Double])).toMap
    assert(got.size === 6) // all unordered pairs of 4 products
    assert(got(("A", "B")).contains(1.0))
    assert(got(("A", "C")).contains(-1.0))
    assert(got(("A", "D")).isEmpty) // constant leg -> null
    assert(got(("B", "C")).contains(-1.0))
  }

  test("pair correlation restricted to a pair list prunes before the hour join") {
    val rows = Seq("2024-01-01 10:00:00", "2024-01-01 11:00:00",
      "2024-01-01 12:00:00").zip(Seq(10.0, 20.0, 30.0)).flatMap {
      case (ts, v) => Seq(("A", ts, v), ("B", ts, 2 * v),
        ("C", ts, 40 - v), ("D", ts, 7.0))
    }
    val h1 = rows.toDF("product_id", "ts", "c")
      .select(col("product_id"),
        col("ts").cast("timestamp_ntz").as("window_start"),
        col("c").cast("decimal(18,8)").as("close"))
    // pair list passed in REVERSED order — normalisation must flip it
    val pairs = Seq(("B", "A"), ("A", "C")).toDF("product_a", "product_b")
    val restricted = Microstructure.pairCorrelation(h1, Some(pairs))
    // only the listed pairs come back, values equal the unrestricted run
    val full = Microstructure.pairCorrelation(h1).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Any]("corr")).toMap
    val got = restricted.collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Any]("corr")).toMap
    assert(got.keySet === Set(("A", "B"), ("A", "C")))
    got.foreach { case (k, v) => assert(v === full(k)) }
    // the pruning is a broadcast semi-join on BOTH legs, before the
    // O(products^2) hour self-join ever forms
    val plan = restricted.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  test("pair correlation without a watchlist refuses past the product valve") {
    val rows = (1 to 12).flatMap { p =>
      Seq("2024-01-01 10:00:00", "2024-01-01 11:00:00").zipWithIndex.map {
        case (ts, i) => (s"P$p", ts, 10.0 + p + i)
      }
    }
    val h1 = rows.toDF("product_id", "ts", "c")
      .select(col("product_id"),
        col("ts").cast("timestamp_ntz").as("window_start"),
        col("c").cast("decimal(18,8)").as("close"))
    val e = intercept[IllegalArgumentException] {
      Microstructure.pairCorrelation(h1, maxProductsUnlisted = 10)
    }
    assert(e.getMessage.contains("watchlist"))
    // a watchlist bypasses the valve regardless of product count
    val pairs = Seq(("P1", "P2")).toDF("product_a", "product_b")
    assert(Microstructure.pairCorrelation(h1, Some(pairs),
      maxProductsUnlisted = 10).count() === 1L)
    // under the cap the unlisted path still runs
    assert(Microstructure.pairCorrelation(h1, maxProductsUnlisted = 12)
      .count() === 66L)
  }

  test("streaming flow imbalance equals the batch aggregation") {
    import graft.sources.Tables
    val s = graft.streaming.BronzeStream.streamingFlowImbalance(spark, sf)
    val batch = graft.operators.Bronze.ingest(Tables.events(spark, sf))
      .withColumn("size", col("size").cast("decimal(18,8)"))
      .filter(col("price") > 0 && col("size") > 0)
      .groupBy(window(col("trade_time").cast("timestamp"), "1 minute"),
        col("product_id"))
      .agg(
        sum(when(col("side") === "buy", col("size")).otherwise(lit(0)))
          .cast("decimal(18,8)").as("buy_volume"),
        sum(when(col("side") === "sell", col("size")).otherwise(lit(0)))
          .cast("decimal(18,8)").as("sell_volume"),
        sum(when(col("side") === "buy", 1L).otherwise(0L)).as("n_buys"),
        sum(when(col("side") === "sell", 1L).otherwise(0L)).as("n_sells"))
      .select(col("window.start").cast("timestamp_ntz").as("window_start"),
        col("product_id"), col("buy_volume"), col("sell_volume"),
        col("n_buys"), col("n_sells"))
    val sv = s.drop("imbalance")
    assert(sv.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(sv).count() === 0)
    assert(s.count() > 0)
  }

  test("flow imbalance splits volume by side") {
    val stg = Seq(
      (1L, "X", "buy", "2.00000000"), (2L, "X", "buy", "2.00000000"),
      (3L, "X", "buy", "2.00000000"), (4L, "X", "sell", "1.00000000"))
      .toDF("trade_id", "product_id", "side", "sz")
      .select(col("trade_id"), col("product_id"), col("side"),
        col("sz").cast("decimal(18,8)").as("size"))
      .withColumn("minute_bucket",
        lit("2024-01-01 10:00:00").cast("timestamp_ntz"))
    val r = Microstructure.flowImbalance(stg).head()
    assert(r.getAs[java.math.BigDecimal]("buy_volume").doubleValue() === 6.0)
    assert(r.getAs[java.math.BigDecimal]("sell_volume").doubleValue() === 1.0)
    assert(r.getAs[Long]("n_buys") === 3L && r.getAs[Long]("n_sells") === 1L)
    assert(r.getAs[Double]("imbalance") === 5.0 / 7.0)
  }
}
