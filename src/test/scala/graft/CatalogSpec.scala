package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Catalog, SnapshotTable}

/** Multi-table atomic catalog commits (the Nessie analog). */
class CatalogSpec extends GraftSuite {
  import spark.implicits._

  private def df(tag: String, n: Int) =
    (1 to n).map(i => (i.toLong, tag)).toDF("id", "tag")

  test("a transaction publishes several tables atomically and in sync") {
    val root = Files.createTempDirectory("graft-cat").toString
    val c0 = Catalog.transact(root, Seq(
      "silver" -> df("s0", 10), "ohlcv" -> df("m0", 5)))
    assert(c0 === 0L && Catalog.latestCommit(root) === 0L)
    assert(Catalog.tables(root) === Seq("ohlcv", "silver"))
    assert(Catalog.read(spark, root, "silver").count() === 10)

    // second transaction updates silver only — ohlcv carries over
    val c1 = Catalog.transact(root, Seq("silver" -> df("s1", 20)))
    assert(c1 === 1L)
    assert(Catalog.read(spark, root, "silver").count() === 20)
    assert(Catalog.read(spark, root, "ohlcv").count() === 5)
    assert(Catalog.tableVersions(root) === Map("silver" -> 1L, "ohlcv" -> 0L))

    // a reader pinned to commit 0 sees the OLD consistent pair
    assert(Catalog.read(spark, root, "silver", commit = 0L)
      .filter(col("tag") === "s0").count() === 10)

    // direct per-table reads are refused — catalog tables have no
    // per-table head; state lives in the manifest
    intercept[IllegalArgumentException] {
      SnapshotTable.read(spark, Catalog.tableRoot(root, "silver"))
    }
  }

  test("a failed stage publishes nothing: readers keep the old cross-table state") {
    val root = Files.createTempDirectory("graft-cat-fail").toString
    Catalog.transact(root, Seq("a" -> df("a0", 4), "b" -> df("b0", 4)))

    // second table's write blows up mid-transaction
    val poison = spark.range(3).select(
      expr("raise_error('stage crash')").as("id"), lit("x").as("tag"))
    intercept[Exception] {
      Catalog.transact(root, Seq("a" -> df("a1", 8), "b" -> poison))
    }
    // nothing moved: same commit, both tables at their old content
    assert(Catalog.latestCommit(root) === 0L)
    assert(Catalog.read(spark, root, "a").filter(col("tag") === "a0").count() === 4)
    assert(Catalog.read(spark, root, "b").filter(col("tag") === "b0").count() === 4)
    // leftovers: 'a' staged v1 (stamped, unreferenced) and 'b' v1 (a
    // crashed unstamped claim) — catalog GC removes both kinds
    assert(SnapshotTable.versions(Catalog.tableRoot(root, "a")) === Seq(0L, 1L))
    val (_, removed) = Catalog.expireCommits(root, retainLast = 2, graceMs = 0L)
    assert(removed === Map("a" -> Seq(1L), "b" -> Seq(1L)))
    assert(SnapshotTable.versions(Catalog.tableRoot(root, "b")) === Seq(0L))
    assert(Catalog.read(spark, root, "a").count() === 4)
  }

  test("optimistic concurrency: losing committer fails fast, retry lands on the new base") {
    val root = Files.createTempDirectory("graft-cat-cas").toString
    Catalog.transact(root, Seq("t" -> df("v0", 3)))
    // a concurrent committer already published commit 1
    Files.createDirectories(Paths.get(root, "_commits"))
    Files.writeString(Paths.get(root, "_commits", "c=1"), "t 0")
    intercept[java.util.ConcurrentModificationException] {
      Catalog.transact(root, Seq("t" -> df("v1", 6)))
    }
    assert(Catalog.latestCommit(root) === 0L)
  }

  test("rollback re-points every table together; GC respects retained history") {
    val root = Files.createTempDirectory("graft-cat-roll").toString
    (0 to 3).foreach { i =>
      Catalog.transact(root, Seq("x" -> df(s"x$i", i + 1), "y" -> df(s"y$i", i + 1)))
    }
    Catalog.rollback(root, 2L)
    assert(Catalog.read(spark, root, "x").filter(col("tag") === "x2").count() === 3)
    assert(Catalog.read(spark, root, "y").filter(col("tag") === "y2").count() === 3)

    // GC: current=2, retain 1 older (c=1), c=3 stays (roll-forward,
    // inside grace), c=0 goes — and with it the now-unreferenced v0s
    val (dropped, removed) = Catalog.expireCommits(root, retainLast = 1)
    assert(dropped === Seq(0L))
    assert(removed === Map("x" -> Seq(0L), "y" -> Seq(0L)))
    assert(Catalog.commits(root) === Seq(1L, 2L, 3L))
    // retained commits still fully readable
    assert(Catalog.read(spark, root, "x", commit = 1L).count() === 2)
    assert(Catalog.read(spark, root, "x", commit = 3L).count() === 4)
    // roll forward to 3 still possible after GC
    Catalog.rollback(root, 3L)
    assert(Catalog.read(spark, root, "y").filter(col("tag") === "y3").count() === 4)
  }
}
