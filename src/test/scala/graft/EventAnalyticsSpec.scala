package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.EventAnalytics

/** Funnel ordering semantics and retention-cohort invariants on a
  * crafted event tape. */
class EventAnalyticsSpec extends GraftSuite {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1704067200000L + m * 60000L)

  test("funnel counts only strictly ordered step sequences") {
    val evs = Seq(
      // user 1: full ordered funnel
      (1L, ts(0), "view"), (1L, ts(1), "click"), (1L, ts(2), "purchase"),
      // user 2: click BEFORE view -> stops at view
      (2L, ts(1), "click"), (2L, ts(2), "view"),
      // user 3: click at the SAME ts as view -> strict < fails
      (3L, ts(0), "view"), (3L, ts(0), "click"),
      // user 4: purchase BEFORE the qualifying click -> reaches click,
      // but the early purchase does not count as step 3
      (4L, ts(0), "view"), (4L, ts(1), "purchase"), (4L, ts(2), "click"),
      // user 5: never views
      (5L, ts(0), "purchase"), (5L, ts(1), "click"))
      .toDF("user_id", "ts", "event_type")
      .withColumn("ts", col("ts").cast("timestamp_ntz"))
    val f = EventAnalytics.funnel(evs).collect()
      .map(r => r.getAs[String]("step") -> r.getAs[Long]("n_users")).toMap
    assert(f("1_view") === 4L)                 // users 1,2,3,4
    assert(f("2_click_after_view") === 2L)     // users 1 and 4
    assert(f("3_purchase_after_click") === 1L) // user 1 only
  }

  test("funnel conversion rates are ratios of step counts") {
    val f = EventAnalytics.funnel(
      graft.sources.Tables.events(spark, sf)).collect()
      .map(r => r.getAs[String]("step") ->
        (r.getAs[Long]("n_users"), r.getAs[Double]("conv_from_first"))).toMap
    val (nv, _) = f("1_view")
    val (np, convP) = f("3_purchase_after_click")
    assert(nv > 0)
    assert(math.abs(convP - np.toDouble / nv.toDouble) < 1e-12)
  }

  test("retention cohorts: offset 0 covers every user exactly once across cohorts") {
    val evs = graft.sources.Tables.events(spark, sf)
    val r = EventAnalytics.retentionCohorts(evs)
    val day0 = r.filter(col("day_offset") === 0)
      .agg(sum("n_users")).head().getLong(0)
    val totalUsers = evs.select(countDistinct("user_id")).head().getLong(0)
    assert(day0 === totalUsers) // everyone is active on their first day
    assert(r.filter(col("day_offset") < 0).count() === 0)
  }
}
