package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types.LongType

import graft.sources.Tables

/** Stateful stream processing: gap-based sessionization with
  * `flatMapGroupsWithState` over the event stream.
  *
  * Demonstrates the custom-state streaming surface (the reference's
  * stack has no analog — its state lives in Kafka offsets + MERGE; a
  * Spark deployment would use exactly this operator for e.g. per-user
  * trade bursts). Sessions close when two consecutive events for the
  * same user are more than `gapMinutes` apart.
  *
  * SEMANTICS — finite replay (backfill): this runner processes a
  * bounded source with `Trigger.AvailableNow` where the file source
  * delivers all input in ONE micro-batch per user, so the group
  * function flushes the trailing open session at end of input rather
  * than holding it in state (a continuous deployment replaces the
  * trailing flush with `GroupStateTimeout.EventTimeTimeout`: keep the
  * open session via `state.update`, set the timeout to last+gap, and
  * emit it from the timeout branch — same session algebra, deferred
  * emission).
  *
  * Scale: state is one open session per user key, hash-partitioned by
  * user — bounded by |active users|, not by throughput; the watermark
  * bounds how long a session can stay open.
  */
object Sessionize {

  case class Event(user_id: Long, ts_ms: Long, value: Double)
  case class OpenSession(start_ms: Long, last_ms: Long, n: Int, sum: Double)
  case class Session(user_id: Long, session_start_ms: Long,
                     session_end_ms: Long, n_events: Int, total_value: Double)

  private val counter = new AtomicInteger(0)

  /** Split one user's (batch-of-)events into gap-delimited sessions.
    * Emits every closed session; carries the open one in state (emitted
    * too when the input is finite and the stream ends). */
  private def sessionizeGroup(gapMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[Session] = {
    val sorted = events.toSeq.sortBy(e => (e.ts_ms, e.value))
    var open = state.getOption
    val out = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_ms - s.last_ms <= gapMs =>
          open = Some(OpenSession(s.start_ms, e.ts_ms, s.n + 1, s.sum + e.value))
        case Some(s) =>
          out += Session(userId, s.start_ms, s.last_ms, s.n, s.sum)
          open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
        case None =>
          open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
      }
    }
    // Finite-input semantics (AvailableNow): flush the trailing session.
    open.foreach { s =>
      out += Session(userId, s.start_ms, s.last_ms, s.n, s.sum)
    }
    state.remove()
    out.result().iterator
  }

  /** Run the sessionizer over the events file as a stream; returns the
    * settled session table. */
  def sessions(spark: SparkSession, dir: String,
               gapMinutes: Int = 30): DataFrame = {
    import spark.implicits._
    val schema = Tables.eventsRawSchema(spark, dir)
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val tsMs =
      if (schema("ts").dataType == LongType) expr("ts div 1000000")
      else unix_millis(col("ts").cast("timestamp"))
    val evs = raw.select(col("user_id"), tsMs.as("ts_ms"), col("value")).as[Event]

    val gapMs = gapMinutes * 60000L
    val sess = evs.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(sessionizeGroup(gapMs))

    val name = s"sessions_${counter.incrementAndGet()}"
    val q = sess.toDF().writeStream.format("memory").queryName(name)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    spark.table(name)
  }

  /** Batch-equivalent sessionization (lag + running session index) for
    * the stream/batch equivalence check. */
  def sessionsBatch(spark: SparkSession, dir: String,
                    gapMinutes: Int = 30): DataFrame = {
    val gapMs = gapMinutes * 60000L
    val evs = Tables.events(spark, dir)
      .select(col("user_id"),
        expr("unix_millis(cast(ts as timestamp))").as("ts_ms"), col("value"))
    val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("value"))
    evs
      .withColumn("prev_ms", lag(col("ts_ms"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ms").isNull ||
          col("ts_ms") - col("prev_ms") > gapMs, 1L).otherwise(0L))
      .withColumn("sess_idx", sum("new_sess").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sess_idx")
      .agg(min("ts_ms").as("session_start_ms"),
        max("ts_ms").as("session_end_ms"),
        count(lit(1)).cast("int").as("n_events"),
        sum("value").as("total_value"))
      .drop("sess_idx")
  }
}
