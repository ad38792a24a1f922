package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{MaterializedView, SnapshotTable}

/** Incremental materialized-view maintenance: applying the CDC feed
  * must land BIT-IDENTICAL to a full recompute — exact decimal sums
  * make increments associative — and groups leave the view when their
  * count hits zero. */
class MaterializedViewSpec extends GraftSuite {
  import spark.implicits._

  private def rows(ids: Range, grp: Long => String): DataFrame =
    ids.map(i => (i.toLong, grp(i.toLong), i * 1.01)).toDF("id", "g", "amt")

  private def fullRecompute(baseRoot: String): Set[(String, Long, BigDecimal)] =
    SnapshotTable.read(spark, baseRoot)
      .groupBy("g")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("amt").cast("decimal(18,4)")).cast("decimal(28,4)")
          .as("amt_sum"))
      .as[(String, Long, BigDecimal)].collect().toSet

  private def view(mvRoot: String): Set[(String, Long, BigDecimal)] =
    SnapshotTable.read(spark, mvRoot).select("g", "n_rows", "amt_sum")
      .as[(String, Long, BigDecimal)].collect().toSet

  test("refresh over upserts and deletes equals full recompute exactly") {
    val base = Files.createTempDirectory("graft-mv-base").toString
    val mv = Files.createTempDirectory("graft-mv").toString
    SnapshotTable.commitDelta(rows(0 until 100, i => s"g${i % 4}"),
      base, "g")
    MaterializedView.create(spark, base, mv, "id", Seq("g"), Seq("amt"))
    assert(view(mv) === fullRecompute(base))

    // CDC upsert: 20 updated rows (tripled amounts) + 10 inserts
    val batch = rows(0 until 20, i => s"g${i % 4}")
      .withColumn("amt", col("amt") * 3)
      .unionByName(rows(200 until 210, _ => "g9"))
    SnapshotTable.upsertMor(spark, base, "g", batch, Seq("id"))
    // and a MoR delete
    SnapshotTable.deleteWhereMor(spark, base, col("id") % 10 === 7)
    MaterializedView.refresh(spark, base, mv)
    assert(view(mv) === fullRecompute(base))

    // a second stacked round: refresh composes across many commits
    SnapshotTable.deleteWhereMor(spark, base, col("g") === "g9")
    SnapshotTable.upsertMor(spark, base, "g",
      rows(300 until 305, _ => "g0"), Seq("id"))
    MaterializedView.refresh(spark, base, mv)
    assert(view(mv) === fullRecompute(base))
  }

  test("a group whose count reaches zero leaves the view; it returns on re-insert") {
    val base = Files.createTempDirectory("graft-mv-zero").toString
    val mv = Files.createTempDirectory("graft-mv-zero-v").toString
    SnapshotTable.commitDelta(rows(0 until 30, i => s"g${i % 3}"),
      base, "g")
    MaterializedView.create(spark, base, mv, "id", Seq("g"), Seq("amt"))
    SnapshotTable.deleteWhereMor(spark, base, col("g") === "g1")
    MaterializedView.refresh(spark, base, mv)
    assert(!view(mv).exists(_._1 == "g1"))
    SnapshotTable.upsertMor(spark, base, "g",
      rows(500 until 502, _ => "g1"), Seq("id"))
    MaterializedView.refresh(spark, base, mv)
    assert(view(mv).count(_._1 == "g1") === 1)
    assert(view(mv) === fullRecompute(base))
  }

  test("pure-append histories take the O(batch) fast path and still match full recompute") {
    val base = Files.createTempDirectory("graft-mv-app").toString
    val mv = Files.createTempDirectory("graft-mv-app-v").toString
    SnapshotTable.commitDelta(rows(0 until 40, i => s"g${i % 4}"),
      base, "g")
    MaterializedView.create(spark, base, mv, "id", Seq("g"), Seq("amt"))
    val from = SnapshotTable.latestVersion(base)
    SnapshotTable.commitAppend(rows(40 until 60, i => s"g${i % 5}"),
      base, "g")
    SnapshotTable.commitAppend(rows(60 until 70, _ => "g7"), base, "g")
    assert(MaterializedView.isAppendOnly(base, from,
      SnapshotTable.latestVersion(base)),
      "append-only commits must qualify for the fast path")
    MaterializedView.refresh(spark, base, mv)
    assert(view(mv) === fullRecompute(base))
    // an upsert (equality-delete sidecar) disqualifies the fast path —
    // and the general path still lands exactly
    val from2 = SnapshotTable.latestVersion(base)
    SnapshotTable.upsertMor(spark, base, "g",
      rows(0 until 5, _ => "g0").withColumn("amt", col("amt") * 10),
      Seq("id"))
    assert(!MaterializedView.isAppendOnly(base, from2,
      SnapshotTable.latestVersion(base)))
    MaterializedView.refresh(spark, base, mv)
    assert(view(mv) === fullRecompute(base))
  }

  test("no-change refresh is a no-op and the covered version advances with the base") {
    val base = Files.createTempDirectory("graft-mv-noop").toString
    val mv = Files.createTempDirectory("graft-mv-noop-v").toString
    SnapshotTable.commitDelta(rows(0 until 10, _ => "g0"), base, "g")
    MaterializedView.create(spark, base, mv, "id", Seq("g"), Seq("amt"))
    val v0 = SnapshotTable.latestVersion(mv)
    assert(MaterializedView.refresh(spark, base, mv) === v0)
    SnapshotTable.upsertMor(spark, base, "g",
      rows(10 until 12, _ => "g0"), Seq("id"))
    MaterializedView.refresh(spark, base, mv)
    assert(MaterializedView.coveredBaseVersion(mv) ===
      SnapshotTable.latestVersion(base))
    assert(view(mv) === fullRecompute(base))
  }

  test("a crash between the view commit and the anchor heals without double-counting") {
    val base = Files.createTempDirectory("graft-mv-heal-base").toString
    val mv = Files.createTempDirectory("graft-mv-heal").toString
    SnapshotTable.commitDelta(rows(0 until 40, i => s"g${i % 3}"),
      base, "g")
    MaterializedView.create(spark, base, mv, "id", Seq("g"), Seq("amt"))
    val defBefore = java.nio.file.Files.readString(
      java.nio.file.Paths.get(mv, "_mv_def"))
    SnapshotTable.commitAppend(rows(100 until 120, i => s"g${i % 3}"),
      base, "g")
    val toV = SnapshotTable.latestVersion(base)
    MaterializedView.refresh(spark, base, mv)
    val healthy = view(mv)
    assert(healthy === fullRecompute(base))

    // reconstruct the crash window: the view COMMIT landed (it is the
    // current mv version) but the anchor write did not — old def back
    // in place plus the refresh intent
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(mv, "_mv_def"), defBefore)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(mv, "_mv_intent"),
      s"$toV ${SnapshotTable.latestVersion(mv)}")

    // the replayed refresh must HEAL (finalize the anchor) instead of
    // re-applying the already-merged delta
    MaterializedView.refresh(spark, base, mv)
    assert(view(mv) === healthy) // no double-count
    assert(MaterializedView.coveredBaseVersion(mv) === toV)

    // and a PRE-commit crash (intent without the landed version) just
    // discards the intent and recomputes normally
    SnapshotTable.commitAppend(rows(200 until 210, i => s"g${i % 3}"),
      base, "g")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(mv, "_mv_intent"),
      s"${SnapshotTable.latestVersion(base)} ${SnapshotTable.latestVersion(mv) + 5}")
    MaterializedView.refresh(spark, base, mv)
    assert(view(mv) === fullRecompute(base))
  }
}
