package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SnapshotTable

/** Partition-spec EVOLUTION (Iceberg's change-the-layout-without-
  * rewriting): `evolvePartitionSpec` is metadata-only — existing
  * directories keep their old layout, later manifested commits write
  * the new one, reads union the eras with per-era partition pruning —
  * and `migrateSpec` folds old-era directories into the current
  * layout on the maintenance cadence. */
class SpecEvolutionSpec extends GraftSuite {
  import spark.implicits._

  // 100 rows, old spec g (g0..g3), future spec h (h0, h1)
  private def seed(root: String): Unit = {
    val df = (0L until 100L)
      .map(i => (i, s"g${i % 4}", s"h${i % 2}", i * 10L))
      .toDF("id", "g", "h", "x")
    SnapshotTable.commitDelta(df, root, "g")
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

  test("evolution is metadata-only; appends land under the new layout; reads union eras") {
    val root = Files.createTempDirectory("graft-spec").toString
    seed(root)
    val before = dataFiles(root)

    SnapshotTable.evolvePartitionSpec(root, "h")
    assert(SnapshotTable.partitionSpec(root) === Some("h"))
    assert(SnapshotTable.partitionSpecAt(root, 0L) === Some("g"))
    assert(dataFiles(root) === before, "evolution must move zero bytes")

    val batch = (100L until 120L)
      .map(i => (i, s"g${i % 4}", s"h${i % 2}", i * 10L))
      .toDF("id", "g", "h", "x")
    val vApp = SnapshotTable.commitAppend(batch, root, "h")
    // new directories use the new layout
    val m = SnapshotTable.manifestEntries(root, vApp)
    assert(m.exists { case (p, sv) => p.startsWith("h=") && sv == vApp })
    assert(m.exists { case (p, _) => p.startsWith("g=") })

    val got = SnapshotTable.read(spark, root)
      .select("id", "g", "h", "x").as[(Long, String, String, Long)]
      .collect().toSet
    val expect = (0L until 120L)
      .map(i => (i, s"g${i % 4}", s"h${i % 2}", i * 10L)).toSet
    assert(got === expect)

    // per-era partition pruning: the new-era scan must carry the
    // filter on its layout column as a PARTITION filter (the old-era
    // scan keeps it as a pushed data filter)
    val pruned = SnapshotTable.read(spark, root).filter(col("h") === "h0")
    val scans = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.size === 2, s"expected one scan per era, got $scans")
    assert(scans.exists(_.partitionFilters.exists(_.toString.contains("h0"))),
      "new-era partition pruning lost")
  }

  test("copy-on-write delta refuses mixed eras; migrateSpec folds them and unblocks") {
    val root = Files.createTempDirectory("graft-spec-mig").toString
    seed(root)
    SnapshotTable.evolvePartitionSpec(root, "h")
    SnapshotTable.commitAppend(
      Seq((100L, "g0", "h0", 1L)).toDF("id", "g", "h", "x"), root, "h")

    val e = intercept[IllegalArgumentException] {
      SnapshotTable.commitDelta(
        Seq((0L, "g0", "h0", -1L)).toDF("id", "g", "h", "x"), root, "h")
    }
    assert(e.getMessage.contains("migrateSpec"))

    val before = SnapshotTable.read(spark, root)
      .select("id", "g", "h", "x").as[(Long, String, String, Long)]
      .collect().toSet
    val vMig = SnapshotTable.migrateSpec(spark, root)
    // single-era now: every live entry under the current layout
    val m = SnapshotTable.manifestEntries(root, vMig)
    assert(m.forall(_._1.startsWith("h=")), s"unmigrated entries: $m")
    val after = SnapshotTable.read(spark, root)
      .select("id", "g", "h", "x").as[(Long, String, String, Long)]
      .collect().toSet
    assert(after === before, "migration changed the answer")
    // idempotent
    assert(SnapshotTable.migrateSpec(spark, root) === vMig)

    // ...and the delta commit now works
    SnapshotTable.commitDelta(
      SnapshotTable.read(spark, root).filter(col("h") === "h0")
        .withColumn("x", col("x") + 1L), root, "h")
    assert(SnapshotTable.read(spark, root).count() === 101)
  }

  test("migration preserves rows whose target partition already exists in the new era") {
    val root = Files.createTempDirectory("graft-spec-overlap").toString
    seed(root) // old era g dirs carry h values h0/h1
    SnapshotTable.evolvePartitionSpec(root, "h")
    // new-era h=h0 dir EXISTS before migration
    SnapshotTable.commitAppend(
      Seq((200L, "g0", "h0", 7L)).toDF("id", "g", "h", "x"), root, "h")
    SnapshotTable.migrateSpec(spark, root)
    val got = SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet
    assert(got === ((0L until 100L).toSet + 200L),
      "rows lost or duplicated when migrating into an existing partition")
  }

  test("MoR deletes and upserts work across eras; fold migrates first") {
    val root = Files.createTempDirectory("graft-spec-mor").toString
    seed(root)
    SnapshotTable.evolvePartitionSpec(root, "h")
    SnapshotTable.upsertMor(spark, root, "h",
      Seq((3L, "g3", "h1", -3L), (300L, "g0", "h0", -4L))
        .toDF("id", "g", "h", "x"), Seq("id"))
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 10L)
    val got = SnapshotTable.read(spark, root)
      .select("id", "x").as[(Long, Long)].collect().toMap
    assert(got(3L) === -3L && got(300L) === -4L && !got.contains(10L))
    assert(got.size === 100) // 100 seed - id10 - id3 + upserted 3 + 300

    val vFold = SnapshotTable.applyDeletes(spark, root)
    assert(SnapshotTable.deleteEntries(root, vFold).isEmpty)
    assert(SnapshotTable.eqDeleteEntries(root, vFold).isEmpty)
    assert(SnapshotTable.manifestEntries(root, vFold)
      .forall(_._1.startsWith("h=")))
    val got2 = SnapshotTable.read(spark, root)
      .select("id", "x").as[(Long, Long)].collect().toMap
    assert(got2 === got, "fold+migrate changed the answer")
  }

  test("maintenance cadence migrates mixed-era tables (no deletes needed)") {
    val root = Files.createTempDirectory("graft-spec-maint").toString
    seed(root)
    SnapshotTable.evolvePartitionSpec(root, "h")
    SnapshotTable.commitAppend(
      Seq((100L, "g1", "h1", 5L)).toDF("id", "g", "h", "x"), root, "h")
    val before = SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet
    graft.operators.Maintenance.runCatalog(spark, Seq("t" -> root))
    val v = SnapshotTable.latestVersion(root)
    assert(SnapshotTable.manifestEntries(root, v)
      .forall(_._1.startsWith("h=")), "maintenance left old-era dirs")
    assert(SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSet === before)
    // snapshots inspection reports the era each version was written in
    val specs = graft.operators.TableInspect.snapshots(spark, root)
      .select("version", "partition_spec").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(specs(0L) === "g" && specs(v) === "h")
  }

  test("readSkipping prunes by recorded bounds across eras") {
    val root = Files.createTempDirectory("graft-spec-skip").toString
    val df = (0L until 100L)
      .map(i => (i, s"g${i % 4}", s"h${i % 2}", i * 10L))
      .toDF("id", "g", "h", "x")
      .repartitionByRange(4, col("id"))
    SnapshotTable.commitDelta(df, root, "g", statsCols = Seq("id"))
    SnapshotTable.evolvePartitionSpec(root, "h")
    val batch = (100L until 120L)
      .map(i => (i, s"g${i % 4}", s"h${i % 2}", i * 10L))
      .toDF("id", "g", "h", "x").repartitionByRange(2, col("id"))
    SnapshotTable.commitAppend(batch, root, "h", statsCols = Seq("id"))

    val pruned = SnapshotTable.readSkipping(spark, root, "id >= 100")
    assert(pruned.select("id").as[Long].collect().toSet ===
      (100L until 120L).toSet)
    // every old-era file is bounds-refuted (id < 100 throughout)
    assert(!pruned.inputFiles.exists(_.contains("g=")),
      "old-era files survived a refuting predicate")

    // renaming a live layout column — old OR new era — fails loudly
    val e1 = intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, root, "g", "g2")
    }
    assert(e1.getMessage.contains("layout"))
    // after migration the old layout column is renameable
    SnapshotTable.migrateSpec(spark, root)
    val vRen = SnapshotTable.renameColumn(spark, root, "g", "g2")
    assert(SnapshotTable.read(spark, root, vRen).columns.contains("g2"))
  }
}
