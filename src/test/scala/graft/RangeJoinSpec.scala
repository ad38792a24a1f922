package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bronze, BronzeToSilver, Microstructure, Ohlcv,
  RangeJoin, Staging}
import graft.sources.Tables

/** Bucket-expansion interval join: equivalence to the naive theta
  * join, boundary semantics, bucket-width invariance, and the plan
  * property that motivates it (no nested-loop join). */
class RangeJoinSpec extends GraftSuite {
  import spark.implicits._

  // deterministic synthetic tape: intervals of varied length (incl.
  // empty and boundary-aligned), points on and off the edges
  private lazy val intervals = Seq(
    ("a", 1L, 0L, 100L), ("a", 2L, 50L, 60L), ("a", 3L, 60L, 60L),
    ("b", 4L, 0L, 1000L), ("b", 5L, 999L, 1001L), ("c", 6L, 10L, 20L)
  ).toDF("k", "iv_id", "s_sec", "e_sec")
    .select(col("k"), col("iv_id"),
      timestamp_seconds(col("s_sec")).cast("timestamp_ntz").as("start"),
      timestamp_seconds(col("e_sec")).cast("timestamp_ntz").as("end"))

  private lazy val points = Seq(
    ("a", 10L, 0L), ("a", 11L, 50L), ("a", 12L, 59L), ("a", 13L, 60L),
    ("a", 14L, 99L), ("a", 15L, 100L), ("b", 16L, 500L), ("b", 17L, 999L),
    ("b", 18L, 1000L), ("c", 19L, 15L), ("d", 20L, 15L)
  ).toDF("k", "pt_id", "t_sec")
    .select(col("k"), col("pt_id"),
      timestamp_seconds(col("t_sec")).cast("timestamp_ntz").as("ts"))

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("iv_id", "pt_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("interval join equals the naive theta join at any bucket width") {
    val naive = intervals.join(points, Seq("k"))
      .filter(col("ts") >= col("start") && col("ts") < col("end"))
    val expect = pairsOf(naive)
    for (w <- Seq(1L, 7L, 60L, 3600L)) {
      val got = pairsOf(RangeJoin.intervalJoin(
        intervals, points, Seq("k"), "start", "end", "ts", w))
      assert(got === expect, s"bucket width $w")
    }
    // semantics spot checks: start inclusive (pt 10 in iv 1), end
    // exclusive (pt 15 NOT in iv 1; pt 13 not in iv 2), empty interval
    // matches nothing (iv 3), key mismatch excluded (pt 20)
    assert(expect.contains((1L, 10L)) && !expect.contains((1L, 15L)))
    assert(!expect.contains((2L, 13L)))
    assert(!expect.exists(_._1 == 3L))
    assert(!expect.exists(_._2 == 20L))
    assert(expect.contains((5L, 17L)) && expect.contains((5L, 18L)))
  }

  test("bucketed plan is a real equi-join, never a nested loop") {
    val df = RangeJoin.intervalJoin(
      intervals, points, Seq("k"), "start", "end", "ts", 60L)
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // while the RAW range predicate alone degenerates to a nested loop
    val naivePlan = intervals.join(points,
        col("ts") >= col("start") && col("ts") < col("end"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"), naivePlan)
  }

  test("trades-during-anomalies equals the naive range join on real data") {
    val st = Staging.stgTrades(BronzeToSilver.transform(
      Bronze.withRedeliveries(Bronze.ingest(Tables.events(spark, sf)))))
      .persist()
    val got = Microstructure.tradesDuringAnomalies(st, Ohlcv.ohlcv1m(st))
      .collect()
    val anom = Ohlcv.anomalyZscore(Ohlcv.ohlcv1m(st), zThresh = 1.0d)
      .filter(col("is_anomaly"))
      .select(col("product_id"), col("window_start").as("w_start"),
        (col("window_start") + expr("INTERVAL 5 MINUTES")).as("w_end"))
    val expect = anom.join(st.select(col("product_id"), col("trade_id"),
        col("trade_time"), col("trade_value")), Seq("product_id"))
      .filter(col("trade_time") >= col("w_start") &&
        col("trade_time") < col("w_end"))
      .groupBy(col("product_id"), col("w_start"))
      .agg(count(lit(1)).as("n"), min("trade_id").as("first_id"))
      .collect()
      .map(r => (r.getString(0), r.get(1).toString) ->
        ((r.getLong(2), r.getLong(3)))).toMap
    assert(got.nonEmpty)
    val gotMap = got.map(r => (r.getString(0), r.get(1).toString) ->
      ((r.getAs[Long]("n_trades"), r.getAs[Long]("first_trade_id")))).toMap
    assert(gotMap === expect)
    st.unpersist()
  }
}
