package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Catalog, SnapshotTable}
import graft.streaming.{GovernedStream, SnapshotStream}

/** The version-offset consumer: each appended batch is delivered once
  * per checkpoint, a crash before the offset commit redelivers, and
  * composing with the governed batch-id sink gives exactly-once across
  * redelivery. */
class SnapshotStreamSpec extends GraftSuite {
  import spark.implicits._

  private def seed(): (String, String) = {
    val tmp = Files.createTempDirectory("graft-snapstream").toString
    val root = s"$tmp/t"
    SnapshotTable.commitAppend(
      Seq(("a", 1L, "d1"), ("b", 2L, "d1")).toDF("k", "n", "day"),
      root, "day")
    (root, s"$tmp/cp")
  }

  test("drainAppends delivers each batch once; nothing new is a no-op") {
    val (root, cp) = seed()
    var seen = Seq.empty[(Long, Long)] // (toVersion, rows)
    def handler(df: DataFrame, v: Long): Unit =
      seen :+= (v, df.count())

    assert(SnapshotStream.drainAppends(spark, root, cp)(handler) === 0L)
    assert(seen === Seq((0L, 2L)))
    // nothing new: handler not invoked
    assert(SnapshotStream.drainAppends(spark, root, cp)(handler) === 0L)
    assert(seen.size === 1)

    SnapshotTable.commitAppend(Seq(("c", 3L, "d2")).toDF("k", "n", "day"),
      root, "day")
    SnapshotTable.commitAppend(Seq(("d", 4L, "d2")).toDF("k", "n", "day"),
      root, "day")
    // two commits drain as ONE batch of only the new rows
    assert(SnapshotStream.drainAppends(spark, root, cp)(handler) === 2L)
    assert(seen.last === (2L, 2L))
    assert(SnapshotStream.committedOffset(cp) === 2L)
  }

  test("a crash before the offset commit redelivers; governed sink dedups the replay") {
    val (root, cp) = seed()
    val cat = root + "-cat"

    // handler that lands the batch in a governed catalog keyed by the
    // drained version — the idempotent sink
    def governed(df: DataFrame, v: Long): Unit =
      GovernedStream.commitBatch(spark, cat, "tail", v,
        df, table = "mirror", partitionCol = "day")

    // first attempt crashes AFTER the governed commit, BEFORE the
    // offset write
    intercept[RuntimeException] {
      SnapshotStream.drainAppends(spark, root, cp) { (df, v) =>
        governed(df, v)
        throw new RuntimeException("crash before checkpoint")
      }
    }
    assert(SnapshotStream.committedOffset(cp) === -1L) // not advanced

    // the retry REDELIVERS the same batch; the batch-id protocol makes
    // the governed commit a no-op — no duplicates
    SnapshotStream.drainAppends(spark, root, cp)(governed)
    assert(SnapshotStream.committedOffset(cp) === 0L)
    val mirror = Catalog.read(spark, cat, "mirror")
    assert(mirror.count() === 2L)
    assert(mirror.select("k").as[String].collect().toSet === Set("a", "b"))
  }

  test("drainChanges bootstraps as inserts, then feeds keyed diffs through an upsert") {
    val (root, cp2) = seed()
    val cp = cp2 + "-cdc"
    var feeds = Seq.empty[Map[String, Long]]
    def handler(df: DataFrame, v: Long): Unit =
      feeds :+= df.groupBy("_change_type").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap

    SnapshotStream.drainChanges(spark, root, "k", cp)(handler)
    assert(feeds === Seq(Map("insert" -> 2L)))

    // an upsert: b changes, e arrives (commit reads current, rewrites)
    val cur = SnapshotTable.read(spark, root)
    val upserted = cur.filter(col("k") =!= "b")
      .unionByName(Seq(("b", 20L, "d1"), ("e", 5L, "d2"))
        .toDF("k", "n", "day"))
    SnapshotTable.commit(upserted, root)

    SnapshotStream.drainChanges(spark, root, "k", cp)(handler)
    assert(feeds.last === Map("insert" -> 1L, "update_preimage" -> 1L,
      "update_postimage" -> 1L))
  }

  test("tail drains until idle") {
    val (root, cp3) = seed()
    val cp = cp3 + "-tail"
    var total = 0L
    val off = SnapshotStream.tail(spark, root, cp,
      pollMs = 10L, maxIdlePolls = 2) { (df, _) => total += df.count() }
    assert(off === 0L)
    assert(total === 2L)
  }
}
