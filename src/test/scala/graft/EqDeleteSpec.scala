package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{MergeUpsert, SnapshotTable}

/** Merge-on-read EQUALITY deletes (Iceberg v2's second delete-file
  * flavor) and the O(batch) CDC upsert built on them: a
  * `deleteEqualityMor` commit masks every STRICTLY OLDER row matching
  * the key set without reading or writing any data byte; `upsertMor`
  * lands a batch's appends and the equality delete of their older
  * twins in ONE commit (the strict sequence rule keeps the batch's own
  * rows alive); `applyDeletes` folds both delete flavors. */
class EqDeleteSpec extends GraftSuite {
  import spark.implicits._

  private def base(root: String): DataFrame = {
    val df = (0L until 100L).map(i => (i, s"g${i % 4}", i * 10L))
      .toDF("id", "g", "x")
    SnapshotTable.commitDelta(df, root, "g")
    SnapshotTable.read(spark, root)
  }

  private def dataFiles(root: String): Map[String, Long] = {
    val stream = Files.walk(Paths.get(root))
    try stream.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("_deletes") &&
        !p.toString.contains("_eqdeletes"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
    finally stream.close()
  }

  test("equality delete masks by key with zero data bytes read or moved") {
    val root = Files.createTempDirectory("graft-eq").toString
    base(root)
    val before = dataFiles(root)

    val v1 = SnapshotTable.deleteEqualityMor(spark, root,
      Seq(3L, 17L, 42L).toDF("id"))
    assert(SnapshotTable.eqDeleteEntries(root, v1) ===
      Seq(v1 -> Seq("id")))
    assert(dataFiles(root) === before,
      "an equality delete must move zero data bytes")
    assert(Files.exists(Paths.get(root, s"v=$v1", "_eqdeletes")))

    val got = SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet
    assert(got === (0L until 100L).toSet -- Set(3L, 17L, 42L))

    // time travel: the pre-delete version still sees everything
    assert(SnapshotTable.read(spark, root, 0).count() === 100)

    // stacks with a position delete
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 5L)
    val got2 = SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet
    assert(got2 === (0L until 100L).toSet -- Set(3L, 5L, 17L, 42L))
  }

  test("sequence rule: rows appended AFTER the delete survive it") {
    val root = Files.createTempDirectory("graft-eq-seq").toString
    base(root)
    SnapshotTable.deleteEqualityMor(spark, root, Seq(7L).toDF("id"))
    assert(!SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet.contains(7L))
    // re-insert id=7 — a NEWER file, outside the delete's sequence
    SnapshotTable.commitAppend(
      Seq((7L, "g3", 777L)).toDF("id", "g", "x"), root, "g")
    val row = SnapshotTable.read(spark, root).filter(col("id") === 7L)
      .select("x").as[Long].collect().toSeq
    assert(row === Seq(777L), "the re-inserted row must survive the " +
      "older equality delete (strict sequence rule)")
  }

  test("upsertMor == copy-on-write MERGE result, with zero existing bytes moved") {
    val root = Files.createTempDirectory("graft-eq-upsert").toString
    base(root)
    val before = dataFiles(root)
    // updates of 0,4,8 (in g0) + inserts 200,201
    val batch = Seq((0L, "g0", -1L), (4L, "g0", -2L), (8L, "g0", -3L),
      (200L, "g0", -4L), (201L, "g1", -5L)).toDF("id", "g", "x")
    val vUp = SnapshotTable.upsertMor(spark, root, "g", batch, Seq("id"))
    // one commit: appended dirs AND the eq sidecar live at the same
    // version; no pre-existing data file was touched
    assert(SnapshotTable.eqDeleteEntries(root, vUp) ===
      Seq(vUp -> Seq("id")))
    before.foreach { case (f, t) =>
      assert(Files.getLastModifiedTime(Paths.get(f)).toMillis === t,
        s"upsertMor touched an existing data file: $f")
    }
    val got = SnapshotTable.read(spark, root)
      .select("id", "g", "x").as[(Long, String, Long)].collect().toSet
    val cow = MergeUpsert.merge(
      (0L until 100L).map(i => (i, s"g${i % 4}", i * 10L))
        .toDF("id", "g", "x"), batch, "id")
      .as[(Long, String, Long)].collect().toSet
    assert(got === cow)

    // a second upsert of the same key wins over the first (stacking)
    SnapshotTable.upsertMor(spark, root, "g",
      Seq((0L, "g0", -100L)).toDF("id", "g", "x"), Seq("id"))
    assert(SnapshotTable.read(spark, root).filter(col("id") === 0L)
      .select("x").as[Long].collect().toSeq === Seq(-100L))
  }

  test("applyDeletes folds equality deletes, pruned to touched partitions") {
    val root = Files.createTempDirectory("graft-eq-fold").toString
    base(root)
    // keys all in partition g=g1 (ids ≡ 1 mod 4)
    SnapshotTable.deleteEqualityMor(spark, root,
      Seq(1L, 5L, 9L).toDF("id"))
    val untouched = dataFiles(root).filter(_._1.contains("g=g2"))
    val vFold = SnapshotTable.applyDeletes(spark, root)
    assert(SnapshotTable.eqDeleteEntries(root, vFold).isEmpty)
    untouched.foreach { case (f, t) =>
      assert(Files.getLastModifiedTime(Paths.get(f)).toMillis === t,
        s"untouched partition file rewritten: $f")
    }
    val got = SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet
    assert(got === (0L until 100L).toSet -- Set(1L, 5L, 9L))
    // idempotent
    assert(SnapshotTable.applyDeletes(spark, root) === vFold)
  }

  test("fold after upsert keeps exactly the merged rows; stale delete no-ops") {
    val root = Files.createTempDirectory("graft-eq-fold2").toString
    base(root)
    SnapshotTable.upsertMor(spark, root, "g",
      Seq((2L, "g2", -7L), (300L, "g2", -8L)).toDF("id", "g", "x"),
      Seq("id"))
    val vFold = SnapshotTable.applyDeletes(spark, root)
    assert(SnapshotTable.eqDeleteEntries(root, vFold).isEmpty)
    val got = SnapshotTable.read(spark, root)
      .filter(col("id").isin(2L, 300L))
      .select("id", "x").as[(Long, Long)].collect().toSet
    assert(got === Set(2L -> -7L, 300L -> -8L))
    assert(SnapshotTable.read(spark, root).count() === 101)

    // an eq delete whose keys matched nothing live folds metadata-only
    SnapshotTable.deleteEqualityMor(spark, root, Seq(9999L).toDF("id"))
    val before = dataFiles(root)
    val v2 = SnapshotTable.applyDeletes(spark, root)
    assert(SnapshotTable.eqDeleteEntries(root, v2).isEmpty)
    assert(dataFiles(root) === before,
      "a no-match fold must be metadata-only")
  }

  test("readSkipping and rename-evolution compose with equality deletes") {
    val root = Files.createTempDirectory("graft-eq-skip").toString
    val df = (0L until 100L).map(i => (i, s"g${i % 4}", i * 10L))
      .toDF("id", "g", "x")
    SnapshotTable.commitDelta(df, root, "g", statsCols = Seq("id"))
    SnapshotTable.deleteEqualityMor(spark, root, Seq(3L).toDF("id"))
    val got = SnapshotTable.readSkipping(spark, root, "id < 10")
      .select("id").as[Long].collect().toSet
    assert(got === (0L until 10L).toSet - 3L)

    // renaming a NON-key column carries the delete refs
    val vRen = SnapshotTable.renameColumn(spark, root, "x", "x2")
    assert(SnapshotTable.eqDeleteEntries(root, vRen).nonEmpty)
    assert(SnapshotTable.read(spark, root).count() === 99)
    // renaming the KEY of an unapplied eq delete fails loudly
    val e = intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, root, "id", "id2")
    }
    assert(e.getMessage.contains("applyDeletes"))

    // expiry keeps the referenced sidecar version alive
    SnapshotTable.commitAppend(
      Seq((1000L, "g0", 1L)).toDF("id", "g", "x2"), root, "g")
    SnapshotTable.commitAppend(
      Seq((1001L, "g0", 2L)).toDF("id", "g", "x2"), root, "g")
    SnapshotTable.expireSnapshots(root, retainLast = 1)
    val eqV = SnapshotTable.eqDeleteEntries(
      root, SnapshotTable.latestVersion(root)).head._1
    assert(Files.exists(Paths.get(root, s"v=$eqV", "_eqdeletes")),
      "expiry removed an equality-delete sidecar still referenced")
    assert(SnapshotTable.read(spark, root).count() === 101)
  }

  test("change data feed sees an upsert as update + insert") {
    val root = Files.createTempDirectory("graft-eq-cdc").toString
    base(root) // v0
    val vUp = SnapshotTable.upsertMor(spark, root, "g",
      Seq((2L, "g2", -7L), (300L, "g2", -8L)).toDF("id", "g", "x"),
      Seq("id"))
    val feed = SnapshotTable.changes(spark, root, "id", 0L, vUp)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed === Set(2L -> "update_preimage", 2L -> "update_postimage",
      300L -> "insert"))
  }
}
