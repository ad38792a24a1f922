package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StringType}

import graft.operators.SnapshotTable

/** Initial DEFAULT values on added columns (Iceberg v3
  * `initial-default`): files written BEFORE the add read the default
  * literal, files written after read their real values — genuine
  * NULLs included, which a blanket coalesce would erase. The default
  * is version metadata: carried by every later commit, gone under
  * time travel to pre-add versions, released by a drop. */
class DefaultValueSpec extends GraftSuite {

  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("pre-add files read the default; post-add files read real values") {
    val root = tmp("graft-def-basic")
    SnapshotTable.commitAppend(
      Seq((1L, "a"), (2L, "b")).toDF("id", "p"), root, "p")
    val vAdd = SnapshotTable.addColumn(spark, root, "rate", DoubleType,
      Some("0.05"))
    // a post-add append carries real values — including a genuine NULL
    SnapshotTable.commitAppend(
      Seq((3L, Some(0.10), "a"), (4L, None: Option[Double], "b"))
        .toDF("id", "rate", "p"), root, "p")
    val got = SnapshotTable.read(spark, root)
      .select("id", "rate").as[(Long, Option[Double])].collect().toMap
    assert(got === Map(1L -> Some(0.05), 2L -> Some(0.05),
      3L -> Some(0.10), 4L -> None))
    // at the add version itself every file predates the column
    val atAdd = SnapshotTable.read(spark, root, vAdd)
      .select("id", "rate").as[(Long, Option[Double])].collect().toMap
    assert(atAdd === Map(1L -> Some(0.05), 2L -> Some(0.05)))
    // time travel before the add has no such column
    assert(!SnapshotTable.read(spark, root, 0L).columns.contains("rate"))
  }

  test("defaults survive later evolution, delta rewrites, and deletes") {
    val root = tmp("graft-def-carry")
    SnapshotTable.commitAppend(
      Seq((1L, 10.0, "a"), (2L, 20.0, "b")).toDF("id", "price", "p"),
      root, "p")
    SnapshotTable.addColumn(spark, root, "src", StringType, Some("'seed'"))
    // a rename of ANOTHER column carries the default
    SnapshotTable.renameColumn(spark, root, "price", "px")
    // a delta rewrite of one partition carries it too; the rewritten
    // rows materialize their read value (the default) into new files
    SnapshotTable.commitDelta(
      Seq((2L, 25.0, "live", "b")).toDF("id", "px", "src", "p"), root, "p")
    val got = SnapshotTable.read(spark, root)
      .select("id", "src").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "seed", 2L -> "live"))
    // a MoR delete (metadata-ish commit) keeps the default readable
    SnapshotTable.deleteWhereMor(spark, root, col("id") === 2L)
    assert(SnapshotTable.read(spark, root)
      .select("src").as[String].collect().toSeq === Seq("seed"))
  }

  test("drop releases the default; re-add under a fresh id starts clean") {
    val root = tmp("graft-def-drop")
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("id", "p"), root, "p")
    SnapshotTable.addColumn(spark, root, "tag", StringType, Some("'x'"))
    SnapshotTable.dropColumn(spark, root, "tag")
    SnapshotTable.addColumn(spark, root, "tag", StringType)
    // the re-added column has NO default — the old entry died with its id
    assert(SnapshotTable.read(spark, root)
      .select("tag").first().isNullAt(0))
  }

  test("non-literal and malformed defaults refuse at add time") {
    val root = tmp("graft-def-bad")
    SnapshotTable.commitAppend(Seq((1L, "a")).toDF("id", "p"), root, "p")
    intercept[IllegalArgumentException] {
      SnapshotTable.addColumn(spark, root, "d", DoubleType, Some("id * 2"))
    }
    intercept[Exception] {
      SnapshotTable.addColumn(spark, root, "d", DoubleType, Some("((("))
    }
    intercept[IllegalArgumentException] { // NULL-folding default
      SnapshotTable.addColumn(spark, root, "d", DoubleType,
        Some("CAST(NULL AS DOUBLE)"))
    }
    assert(!SnapshotTable.read(spark, root).columns.contains("d"))
  }

  test("defaults are FROZEN at add time: expressions fold to one literal") {
    val root = tmp("graft-def-frozen")
    SnapshotTable.commitAppend(Seq((1L, "a"), (2L, "a"))
      .toDF("id", "p"), root, "p")
    // a non-deterministic default evaluates ONCE — every pre-add row
    // reads the SAME frozen value, on every read
    SnapshotTable.addColumn(spark, root, "r", DoubleType, Some("rand()"))
    def vals(): Set[Double] = SnapshotTable.read(spark, root)
      .select("r").as[Double].collect().toSet
    val first = vals()
    assert(first.size === 1, s"default must be one frozen value: $first")
    assert(vals() === first, "frozen default drifted between reads")
  }
}
