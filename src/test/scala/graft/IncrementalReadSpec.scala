package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SnapshotTable

/** Incremental append scan (`appendedBetween`): read only what
  * arrived between two snapshots from manifest arithmetic — never a
  * two-snapshot diff — with merge-on-read deletes resolved and a loud
  * refusal on non-append-only histories. */
class IncrementalReadSpec extends GraftSuite {
  import spark.implicits._

  private def seed(root: String): Long =
    SnapshotTable.commitDelta(
      (0L until 40L).map(i => (i, s"g${i % 4}", i)).toDF("id", "g", "x"),
      root, "g")

  test("appended rows only; empty range; full read from -1") {
    val root = Files.createTempDirectory("graft-incr").toString
    val v0 = seed(root)
    SnapshotTable.commitAppend(
      Seq((100L, "g0", 1L), (101L, "g1", 2L)).toDF("id", "g", "x"),
      root, "g")
    val v2 = SnapshotTable.commitAppend(
      Seq((102L, "g2", 3L)).toDF("id", "g", "x"), root, "g")

    val inc = SnapshotTable.appendedBetween(spark, root, v0)
      .select("id").as[Long].collect().toSet
    assert(inc === Set(100L, 101L, 102L))
    // the scan reads ONLY the appended files
    assert(SnapshotTable.appendedBetween(spark, root, v0)
      .inputFiles.forall(f => !f.contains(s"v=$v0/")))
    // empty range
    assert(SnapshotTable.appendedBetween(spark, root, v2).isEmpty)
    // from = -1 is the full read
    assert(SnapshotTable.appendedBetween(spark, root, -1L).count() === 43)
  }

  test("deletes and upserts inside the range resolve; rewrites refuse loudly") {
    val root = Files.createTempDirectory("graft-incr-mor").toString
    val v0 = seed(root)
    SnapshotTable.commitAppend(
      Seq((100L, "g0", 1L), (101L, "g1", 2L)).toDF("id", "g", "x"),
      root, "g")
    // appended-then-deleted inside the range never surfaces
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 100L)
    // an upsert inside the range surfaces only its newest twin
    SnapshotTable.upsertMor(spark, root, "g",
      Seq((101L, "g1", -2L)).toDF("id", "g", "x"), Seq("id"))
    val inc = SnapshotTable.appendedBetween(spark, root, v0)
      .select("id", "x").as[(Long, Long)].collect().toSet
    assert(inc === Set(101L -> -2L))

    // a copy-on-write rewrite breaks file arithmetic: loud refusal
    SnapshotTable.applyDeletes(spark, root) // folds -> rewrites g0/g1
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.appendedBetween(spark, root, v0)
    }
    assert(e.getMessage.contains("append-only"))
    // ...but a post-compaction baseline works again
    val vc = SnapshotTable.latestVersion(root)
    SnapshotTable.commitAppend(
      Seq((200L, "g3", 9L)).toDF("id", "g", "x"), root, "g")
    assert(SnapshotTable.appendedBetween(spark, root, vc)
      .select("id").as[Long].collect().toSet === Set(200L))
  }
}
