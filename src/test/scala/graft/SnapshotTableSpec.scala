package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SnapshotTable

/** Versioned table: commit / time travel / merge / rollback / expiry. */
class SnapshotTableSpec extends GraftSuite {
  import spark.implicits._

  test("commit, time travel, merge, rollback, expire") {
    val root = Files.createTempDirectory("graft-snap").toString
    val v0data = Seq((1L, "a"), (2L, "b")).toDF("id", "v")

    val v0 = SnapshotTable.commit(v0data, root)
    assert(v0 === 0 && SnapshotTable.latestVersion(root) === 0)

    // merge-commit: update id=2, insert id=3
    val src = Seq((2L, "B"), (3L, "c")).toDF("id", "v")
    val v1 = SnapshotTable.mergeCommit(spark, root, src, "id")
    assert(v1 === 1)
    val now = SnapshotTable.read(spark, root).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(now === Seq((1L, "a"), (2L, "B"), (3L, "c")))

    // time travel: v0 unchanged
    val old = SnapshotTable.read(spark, root, 0).orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(old === Seq((1L, "a"), (2L, "b")))

    // two more commits then expire keeping 2 (plus current)
    SnapshotTable.commit(v0data, root)
    SnapshotTable.commit(src, root)
    val removed = SnapshotTable.expireSnapshots(root, retainLast = 2)
    assert(removed === Seq(0L))
    assert(SnapshotTable.versions(root) === Seq(1L, 2L, 3L))

    // rollback to v2 and read it as current
    SnapshotTable.rollback(root, 2)
    assert(SnapshotTable.read(spark, root).count() === 2)
    assert(SnapshotTable.latestVersion(root) === 2)

    // commit after rollback must NOT overwrite the still-on-disk v3:
    // next version is max(existing)+1
    val v4 = SnapshotTable.commit(v0data, root)
    assert(v4 === 4)
    assert(SnapshotTable.versions(root) === Seq(1L, 2L, 3L, 4L))
    assert(SnapshotTable.read(spark, root, 3).count() === 2) // v3 intact
  }

  test("expiry after rollback preserves roll-forward targets") {
    val root = Files.createTempDirectory("graft-snap-rf").toString
    (0 to 3).foreach { i =>
      SnapshotTable.commit(Seq((i.toLong, s"v$i")).toDF("id", "v"), root)
    }
    SnapshotTable.rollback(root, 1)

    // current=1; only versions < 1 are expiry candidates — v2/v3 are
    // roll-forward targets and must survive even with retainLast=0
    val removed = SnapshotTable.expireSnapshots(root, retainLast = 0)
    assert(removed === Seq(0L))
    assert(SnapshotTable.versions(root) === Seq(1L, 2L, 3L))

    // roll FORWARD to v3 and read it — the data is intact
    SnapshotTable.rollback(root, 3)
    val rows = SnapshotTable.read(spark, root).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(rows === Seq((3L, "v3")))
  }

  test("concurrent committers cannot claim the same version") {
    val root = Files.createTempDirectory("graft-snap-race").toString
    SnapshotTable.commit(Seq((1L, "a")).toDF("id", "v"), root)

    // Simulate the two-writer race: both computed next=1; the first
    // claim wins, the second must fail fast (not silently overwrite)
    SnapshotTable.claimVersion(root, 1)
    intercept[java.util.ConcurrentModificationException] {
      SnapshotTable.claimVersion(root, 1)
    }

    // a fresh commit skips the claimed-but-unpublished dir: next=2
    val v2 = SnapshotTable.commit(Seq((2L, "b")).toDF("id", "v"), root)
    assert(v2 === 2)
    assert(SnapshotTable.latestVersion(root) === 2)
  }

  test("change feed classifies inserts, deletes, and update pre/post images") {
    val root = Files.createTempDirectory("graft-snap-cdf").toString
    SnapshotTable.commit(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"), root)
    SnapshotTable.commit(
      Seq((1L, "a"), (2L, "B"), (4L, "d")).toDF("id", "v"), root)
    val ch = SnapshotTable.changes(spark, root, "id", 0L, 1L).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("_change_type")) ->
        r.getAs[String]("v")).toMap
    assert(ch.size === 4) // unchanged id=1 emits nothing
    assert(ch((4L, "insert")) === "d")
    assert(ch((3L, "delete")) === "c")
    assert(ch((2L, "update_preimage")) === "b")
    assert(ch((2L, "update_postimage")) === "B")
    assert(SnapshotTable.changes(spark, root, "id", 0L, 1L)
      .head().getAs[Long]("_commit_version") === 1L)
  }
}
