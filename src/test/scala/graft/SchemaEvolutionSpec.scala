package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._

import graft.operators.{MergeUpsert, SnapshotTable}

/** Field-id rename/drop schema evolution: metadata-only commits, old
  * eras resolve by id, time travel reads each version under its own
  * names, and no drop-then-readd resurrection. */
class SchemaEvolutionSpec extends GraftSuite {
  import spark.implicits._

  private def mkTable: String = {
    val root = Files.createTempDirectory("graft-evo").toString
    val b1 = Seq((1L, "d0", 10.0, "x1"), (2L, "d1", 20.0, "x2"))
      .toDF("id", "day", "price", "note")
    SnapshotTable.commitDelta(b1, root, "day")
    root
  }

  test("rename is a metadata-only commit; both eras read under the new name") {
    val root = mkTable
    val vOld = SnapshotTable.latestVersion(root)
    val dataDirsBefore = Files.list(java.nio.file.Paths.get(root, s"v=$vOld"))
      .count()
    val vRen = SnapshotTable.renameColumn(spark, root, "price", "px")
    // metadata-only: the new version dir holds no partition directories
    assert(Files.list(java.nio.file.Paths.get(root, s"v=$vRen"))
      .iterator().asScala.count(p => Files.isDirectory(p)) === 0)
    assert(dataDirsBefore > 0)
    val cur = SnapshotTable.read(spark, root)
    // data columns in schema order, partition column last (the same
    // layout every manifested read returns)
    assert(cur.columns.toSeq === Seq("id", "px", "note", "day"))
    assert(cur.filter(col("id") === 1L).head().getAs[Double]("px") === 10.0)

    // append AFTER the rename under the new name: files of both eras
    // coexist; id-resolution unifies them
    val b2 = Seq((3L, "d0", 30.0, "x3")).toDF("id", "day", "px", "note")
    SnapshotTable.commitAppend(b2, root, "day")
    val all = SnapshotTable.read(spark, root).orderBy("id").collect()
    assert(all.map(_.getAs[Double]("px")).toSeq === Seq(10.0, 20.0, 30.0))

    // time travel: the pre-rename version still reads its own era name
    val old = SnapshotTable.read(spark, root, vOld)
    assert(old.columns.contains("price") && !old.columns.contains("px"))
    assert(old.count() === 2)
  }

  test("MergeUpsert accepts the renamed schema") {
    val root = mkTable
    SnapshotTable.renameColumn(spark, root, "price", "px")
    val source = Seq((2L, "d1", 99.0, "upd"), (4L, "d1", 40.0, "new"))
      .toDF("id", "day", "px", "note")
    val merged = MergeUpsert.merge(SnapshotTable.read(spark, root),
      source, "id")
    val m = merged.orderBy("id").collect()
    assert(m.map(_.getAs[Long]("id")).toSeq === Seq(1L, 2L, 4L))
    assert(m(1).getAs[Double]("px") === 99.0)
    // and lands back as a partition-pruned delta commit
    SnapshotTable.mergeDeltaCommit(spark, root, source, "id", "day")
    val after = SnapshotTable.read(spark, root)
    assert(after.filter(col("id") === 2L).head().getAs[Double]("px") === 99.0)
    assert(after.count() === 3)
  }

  test("drop is metadata-only; a re-added name gets a fresh id and never resurrects") {
    val root = mkTable
    SnapshotTable.dropColumn(spark, root, "note")
    val cur = SnapshotTable.read(spark, root)
    assert(cur.columns.toSet === Set("id", "day", "price"))
    // re-add `note` via an append that carries it: fresh field id —
    // era-1 files' old note bytes must NOT resurrect
    val b2 = Seq((3L, "d0", 30.0, "fresh")).toDF("id", "day", "price", "note")
    SnapshotTable.commitAppend(b2, root, "day")
    val rows = SnapshotTable.read(spark, root).orderBy("id").collect()
    assert(rows.map(r => Option(r.getAs[String]("note"))).toSeq ===
      Seq(None, None, Some("fresh")))
    // time travel before the drop still serves the old column
    assert(SnapshotTable.read(spark, root, 0L).columns.contains("note"))
  }

  test("add is metadata-only; pre-add files null-fill the typed column") {
    val root = mkTable
    val vOld = SnapshotTable.latestVersion(root)
    val vAdd = SnapshotTable.addColumn(spark, root, "qty",
      org.apache.spark.sql.types.LongType)
    // metadata-only: the new version dir holds no partition directories
    assert(Files.list(java.nio.file.Paths.get(root, s"v=$vAdd"))
      .iterator().asScala.count(p => Files.isDirectory(p)) === 0)
    val cur = SnapshotTable.read(spark, root)
    assert(cur.columns.toSeq === Seq("id", "price", "note", "qty", "day"))
    assert(cur.schema("qty").dataType ===
      org.apache.spark.sql.types.LongType)
    assert(cur.collect().forall(_.getAs[Any]("qty") == null))

    // an append carrying the column unifies with the null-filled era
    val b2 = Seq((3L, "d0", 30.0, "x3", 7L))
      .toDF("id", "day", "price", "note", "qty")
    SnapshotTable.commitAppend(b2, root, "day")
    val all = SnapshotTable.read(spark, root).orderBy("id").collect()
    assert(all.map(r => Option(r.getAs[Any]("qty"))).toSeq ===
      Seq(None, None, Some(7L)))

    // time travel: the pre-add version has no such column
    assert(!SnapshotTable.read(spark, root, vOld).columns.contains("qty"))
    // duplicate add refuses
    intercept[IllegalArgumentException] {
      SnapshotTable.addColumn(spark, root, "price",
        org.apache.spark.sql.types.IntegerType)
    }
  }

  test("add after a drop of the same name never resurrects old bytes") {
    val root = mkTable
    SnapshotTable.dropColumn(spark, root, "note")
    SnapshotTable.addColumn(spark, root, "note",
      org.apache.spark.sql.types.StringType)
    // fresh field id: era-0 files' note bytes stay dead
    val rows = SnapshotTable.read(spark, root).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("note") == null))
  }

  test("rename of the partition column is refused") {
    val root = mkTable
    intercept[IllegalArgumentException] {
      SnapshotTable.renameColumn(spark, root, "day", "dt")
    }
    intercept[IllegalArgumentException] {
      SnapshotTable.dropColumn(spark, root, "day")
    }
  }

}
