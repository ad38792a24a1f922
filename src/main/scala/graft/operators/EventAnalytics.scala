package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product-analytics operators over the raw event stream: ordered
  * funnels and retention cohorts — the user-behavior queries every
  * event warehouse serves next to its OLAP marts.
  *
  * Both are single-window-shuffle plans: events shuffle once on
  * user_id; everything after the window reduces to |users| (funnel) or
  * |cohorts × offsets| (retention) rows. The windows use the default
  * RANGE frame (peers included), so results are independent of the
  * physical order of same-timestamp rows — required for cross-engine
  * determinism and for any-partitioning correctness at scale.
  */
object EventAnalytics {

  /** Ordered 3-step funnel view → click → purchase: a step counts only
    * if it happens STRICTLY after the user's previous step. Running
    * per-user minima via cumulative windows (one shuffle); the strict
    * `<` comparison makes same-timestamp step pairs not qualify, and
    * with the RANGE frame that rule is tie-order independent.
    *
    * Output: one row per step with the user count, the conversion rate
    * from the previous step, and from the first step. */
  def funnel(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts")
    val perUser = events
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("cum_view",
        min(when(col("event_type") === "view", col("ts"))).over(w))
      .withColumn("cum_click",
        min(when(col("event_type") === "click" && col("cum_view") < col("ts"),
          col("ts"))).over(w))
      .groupBy("user_id")
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("t1"),
        min(when(col("event_type") === "click" && col("cum_view") < col("ts"),
          col("ts"))).as("t2"),
        min(when(col("event_type") === "purchase" && col("cum_click") < col("ts"),
          col("ts"))).as("t3"))
    val agg = perUser.agg(
      count(col("t1")).as("nv"), count(col("t2")).as("nc"),
      count(col("t3")).as("np"))
    agg.select(
      explode(array(
        struct(lit("1_view").as("step"), col("nv").as("n_users"),
          lit(1.0d).as("conv_from_prev"), lit(1.0d).as("conv_from_first")),
        struct(lit("2_click_after_view").as("step"), col("nc").as("n_users"),
          (col("nc").cast("double") / nullif(col("nv").cast("double"), lit(0.0d)))
            .as("conv_from_prev"),
          (col("nc").cast("double") / nullif(col("nv").cast("double"), lit(0.0d)))
            .as("conv_from_first")),
        struct(lit("3_purchase_after_click").as("step"), col("np").as("n_users"),
          (col("np").cast("double") / nullif(col("nc").cast("double"), lit(0.0d)))
            .as("conv_from_prev"),
          (col("np").cast("double") / nullif(col("nv").cast("double"), lit(0.0d)))
            .as("conv_from_first")))).as("s"))
      .select("s.step", "s.n_users", "s.conv_from_prev", "s.conv_from_first")
  }

  /** Retention cohorts: users grouped by first-seen date; one row per
    * (cohort_date, day_offset) with the distinct active users. The
    * cohort date is a cumulative-min window over the same user_id
    * shuffle; the count-distinct reduces on (cohort, offset). */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id")
    events
      .select(col("user_id"), to_date(col("ts")).as("d"))
      .withColumn("cohort_date", min(col("d")).over(w))
      .withColumn("day_offset", datediff(col("d"), col("cohort_date")))
      .groupBy("cohort_date", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_users"))
  }
}
