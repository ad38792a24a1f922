package graft

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SnapshotTable

/** Merge-on-read position deletes (Iceberg v2 delete files): a
  * `deleteWhereMor` commit masks rows through a `_deletes` sidecar
  * without touching any data byte; reads resolve the sidecars;
  * `applyDeletes` folds them back into clean data. */
class MorDeleteSpec extends GraftSuite {
  import spark.implicits._

  private def base(root: String): DataFrame = {
    val df = (0L until 100L).map(i => (i, s"g${i % 4}", i * 10L))
      .toDF("id", "g", "x")
    SnapshotTable.commitDelta(df, root, "g")
    SnapshotTable.read(spark, root)
  }

  /** All data parquet files under the table with last-modified times
    * (sidecar/metadata dirs excluded). */
  private def dataFiles(root: String): Map[String, Long] = {
    val stream = Files.walk(Paths.get(root))
    try stream.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") &&
        !p.toString.contains("_deletes"))
      .map(p => p.toString -> Files.getLastModifiedTime(p).toMillis)
      .toMap
    finally stream.close()
  }

  test("MoR delete masks rows without touching data bytes; deletes stack") {
    val root = Files.createTempDirectory("graft-mor").toString
    base(root)
    val before = dataFiles(root)

    val v1 = SnapshotTable.deleteWhereMor(spark, root, col("id") < lit(10L))
    assert(SnapshotTable.deleteEntries(root, v1) === Seq(v1))
    assert(dataFiles(root) === before, "a MoR delete must move zero data bytes")
    assert(Files.exists(Paths.get(root, s"v=$v1", "_deletes")))

    val got1 = SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet
    assert(got1 === (10L until 100L).toSet)

    // second delete matches against the already-deleted view and stacks
    val v2 = SnapshotTable.deleteWhereMor(spark, root,
      col("x") >= lit(900L))
    assert(SnapshotTable.deleteEntries(root, v2) === Seq(v1, v2))
    val got2 = SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet
    assert(got2 === (10L until 90L).toSet)

    // time travel: pre-delete version still sees everything
    assert(SnapshotTable.read(spark, root, 0).count() === 100)

    // no-match delete is a no-op (no new version)
    assert(SnapshotTable.deleteWhereMor(spark, root,
      col("id") > lit(10000L)) === v2)

    // null-predicate rows are KEPT (SQL DELETE semantics)
    val v3 = SnapshotTable.deleteWhereMor(spark, root,
      when(col("id") === 50L, lit(null).cast("boolean"))
        .otherwise(col("id") === 60L))
    val got3 = SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet
    assert(got3.contains(50L) && !got3.contains(60L))

    // MoR result ≡ what copy-on-write deleteWhere would have produced
    val cowRoot = Files.createTempDirectory("graft-mor-cow").toString
    base(cowRoot)
    SnapshotTable.deleteWhere(spark, cowRoot, "g",
      col("id") < 10L || col("x") >= 900L || col("id") === 60L)
    val cow = SnapshotTable.read(spark, cowRoot).orderBy("id")
      .select("id", "g", "x").collect().toSeq
    val mor = SnapshotTable.read(spark, root).orderBy("id")
      .select("id", "g", "x").collect().toSeq
    assert(mor === cow)
  }

  test("applyDeletes folds sidecars into clean data, pruned to touched partitions") {
    val root = Files.createTempDirectory("graft-mor-fold").toString
    base(root)
    // delete only rows of partition g=g1 (ids ≡ 1 mod 4, below 40)
    SnapshotTable.deleteWhereMor(spark, root,
      col("g") === "g1" && col("id") < 40L)
    val untouched = dataFiles(root).filter(_._1.contains("g=g2"))

    val vFold = SnapshotTable.applyDeletes(spark, root)
    assert(SnapshotTable.deleteEntries(root, vFold).isEmpty)
    // untouched partitions moved zero bytes
    untouched.foreach { case (f, t) =>
      assert(Files.getLastModifiedTime(Paths.get(f)).toMillis === t,
        s"untouched partition file rewritten: $f")
    }
    val got = SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet
    val expect = (0L until 100L).toSet --
      (0L until 40L).filter(_ % 4 == 1).toSet
    assert(got === expect)
    // idempotent: no deletes left → same version back
    assert(SnapshotTable.applyDeletes(spark, root) === vFold)
  }

  test("a partition fully emptied by MoR delete does not resurrect after fold") {
    val root = Files.createTempDirectory("graft-mor-empty").toString
    base(root)
    SnapshotTable.deleteWhereMor(spark, root, col("g") === "g3")
    assert(SnapshotTable.read(spark, root)
      .filter(col("g") === "g3").count() === 0)
    SnapshotTable.applyDeletes(spark, root)
    val m = SnapshotTable.manifestEntries(
      root, SnapshotTable.latestVersion(root))
    assert(!m.exists(_._1 == "g=g3"), "emptied partition must leave the manifest")
    assert(SnapshotTable.read(spark, root).count() === 75)
  }

  test("later delta rewrite does not resurrect MoR-deleted rows; stale entries no-op") {
    val root = Files.createTempDirectory("graft-mor-delta").toString
    base(root)
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 17L) // in g1
    // rewrite partition g1 from the logical table (delete applied)
    val g1 = SnapshotTable.read(spark, root).filter(col("g") === "g1")
      .withColumn("x", col("x") + 1L)
    SnapshotTable.commitDelta(g1, root, "g")
    val got = SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet
    assert(!got.contains(17L) && got.size === 99)
    // the stale delete entry still rides the manifest but masks nothing
    assert(SnapshotTable.deleteEntries(
      root, SnapshotTable.latestVersion(root)).nonEmpty)
    // ...and the fold drops it as a metadata-only commit (g1's files
    // were rewritten, so no live delete rows remain)
    val vFold = SnapshotTable.applyDeletes(spark, root)
    assert(SnapshotTable.deleteEntries(root, vFold).isEmpty)
    assert(SnapshotTable.read(spark, root).count() === 99)
  }

  test("expiry keeps referenced delete sidecar versions; rename carries deletes") {
    val root = Files.createTempDirectory("graft-mor-exp").toString
    base(root)
    val vDel = SnapshotTable.deleteWhereMor(spark, root, col("id") < 5L)
    // a rename (metadata-only evolution) must carry the delete refs
    val vRen = SnapshotTable.renameColumn(spark, root, "x", "x2")
    assert(SnapshotTable.deleteEntries(root, vRen) === Seq(vDel))
    val df = SnapshotTable.read(spark, root)
    assert(df.columns.contains("x2") && df.count() === 95)

    // pile on commits, then expire: the sidecar version stays on disk
    SnapshotTable.commitAppend(
      Seq((1000L, "g0", 7L)).toDF("id", "g", "x2"), root, "g")
    SnapshotTable.commitAppend(
      Seq((1001L, "g0", 8L)).toDF("id", "g", "x2"), root, "g")
    SnapshotTable.expireSnapshots(root, retainLast = 1)
    assert(Files.exists(Paths.get(root, s"v=$vDel", "_deletes")),
      "expiry removed a delete sidecar still referenced by the current manifest")
    assert(SnapshotTable.read(spark, root).count() === 97)
  }

  test("change data feed reports MoR-deleted rows as deletes") {
    val root = Files.createTempDirectory("graft-mor-cdc").toString
    base(root) // v0
    val vDel = SnapshotTable.deleteWhereMor(spark, root,
      col("id").isin(5L, 17L))
    val feed = SnapshotTable.changes(spark, root, "id", 0L, vDel)
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed === Set(5L -> "delete", 17L -> "delete"))
  }

  test("readSkipping applies MoR deletes") {
    val root = Files.createTempDirectory("graft-mor-skip").toString
    val df = (0L until 100L).map(i => (i, s"g${i % 4}", i * 10L))
      .toDF("id", "g", "x")
    SnapshotTable.commitDelta(df, root, "g", statsCols = Seq("id"))
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 3L)
    val got = SnapshotTable.readSkipping(spark, root, "id < 10")
      .select("id").as[Long].collect().toSet
    assert(got === (0L until 10L).toSet - 3L)
  }
}
