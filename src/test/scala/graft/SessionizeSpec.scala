package graft

import org.apache.spark.sql.functions._

import graft.streaming.Sessionize

/** Stateful streaming sessionization: stream/batch equivalence. */
class SessionizeSpec extends GraftSuite {

  test("flatMapGroupsWithState sessions match the batch lag-based sessionization") {
    val stream = Sessionize.sessions(spark, sf, gapMinutes = 30)
    val batch = Sessionize.sessionsBatch(spark, sf, gapMinutes = 30)

    assert(stream.count() > 0)
    assert(stream.count() === batch.count())

    // exact match on session boundaries + event counts
    val sKeys = stream.select("user_id", "session_start_ms",
      "session_end_ms", "n_events")
    val bKeys = batch.select("user_id", "session_start_ms",
      "session_end_ms", "n_events")
    assert(sKeys.exceptAll(bKeys).count() === 0)
    assert(bKeys.exceptAll(sKeys).count() === 0)

    // double sums agree to fp tolerance (summation order differs)
    val joined = stream.as("s").join(batch.as("b"),
      Seq("user_id", "session_start_ms", "session_end_ms"))
    val maxDiff = joined
      .select(max(abs(col("s.total_value") - col("b.total_value"))))
      .head().getDouble(0)
    assert(maxDiff < 1e-6)
  }

  test("sessions respect the gap: no intra-session gap exceeds it, all inter-session gaps do") {
    val s = Sessionize.sessions(spark, sf, gapMinutes = 30)
    // consecutive sessions of the same user must be > 30 min apart
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy("session_start_ms")
    val bad = s.withColumn("prev_end", lag("session_end_ms", 1).over(w))
      .filter(col("prev_end").isNotNull &&
        col("session_start_ms") - col("prev_end") <= 30 * 60000L)
    assert(bad.count() === 0)
  }
}
