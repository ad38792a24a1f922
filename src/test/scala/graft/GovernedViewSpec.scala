package graft

import java.nio.file.Files

import graft.operators.Catalog

/** Persisted views on the GOVERNED catalog (VERDICT r10 #8): a view
  * definition is catalog state — CREATE/REPLACE/DROP publish as one
  * atomic rollback-able catalog commit, a fresh catalog instance
  * (new session analog) resolves the stored definition from disk, and
  * `VERSION AS OF <commit>` resolves the DEFINITION at that commit
  * with its table references pinned there too. */
class GovernedViewSpec extends GraftSuite {
  import spark.implicits._

  private def mkCat(name: String): String = {
    val cat = Files.createTempDirectory("graft-govview").toString + "/cat"
    spark.conf.set(s"spark.sql.catalog.$name",
      "graft.sources.GraftGovernedCatalog")
    spark.conf.set(s"spark.sql.catalog.$name.root", cat)
    Catalog.transactDelta(cat, Seq(("t",
      Seq(("a", 1L, "x"), ("b", 2L, "x")).toDF("k", "n", "p"), "p")))
    cat
  }

  test("CREATE VIEW is one atomic commit; a fresh catalog instance resolves it") {
    val cat = mkCat("gv1")
    val c0 = Catalog.latestCommit(cat)
    spark.sql("CREATE VIEW gv1.totals AS " +
      "SELECT sum(n) AS total, count(*) AS rows FROM gv1.t")
    assert(Catalog.latestCommit(cat) === c0 + 1) // ONE commit
    assert(spark.sql("SELECT total FROM gv1.totals").first.getLong(0) === 3L)
    // survives a "new session": a SECOND catalog instance over the
    // same root (fresh initialize, no shared state) resolves the view
    spark.conf.set("spark.sql.catalog.gv1b",
      "graft.sources.GraftGovernedCatalog")
    spark.conf.set("spark.sql.catalog.gv1b.root", cat)
    try {
      assert(spark.sql("SELECT total FROM gv1b.totals")
        .first.getLong(0) === 3L)
      assert(spark.sql("SHOW VIEWS IN gv1b").collect()
        .map(_.getString(1)).toSeq === Seq("totals"))
    } finally spark.conf.unset("spark.sql.catalog.gv1b")
  }

  test("VERSION AS OF pins the definition AND the data at the commit") {
    val cat = mkCat("gv2")
    spark.sql("CREATE VIEW gv2.v AS SELECT sum(n) AS total FROM gv2.t")
    val cView = Catalog.latestCommit(cat)
    // data moves: the live view follows, the pinned read does not
    spark.sql("INSERT INTO gv2.t VALUES ('c', 10, 'x')")
    assert(spark.sql("SELECT total FROM gv2.v").first.getLong(0) === 13L)
    assert(spark.sql(s"SELECT total FROM gv2.v VERSION AS OF $cView")
      .first.getLong(0) === 3L)
    // the DEFINITION moves too: replace doubles the total; the pin
    // still resolves the OLD definition over the OLD data
    spark.sql("CREATE OR REPLACE VIEW gv2.v AS " +
      "SELECT sum(n) * 2 AS total FROM gv2.t")
    val cMid = Catalog.latestCommit(cat) - 1 // the commit before replace
    assert(spark.sql("SELECT total FROM gv2.v").first.getLong(0) === 26L)
    assert(spark.sql(s"SELECT total FROM gv2.v VERSION AS OF $cView")
      .first.getLong(0) === 3L)
    assert(spark.sql(s"SELECT total FROM gv2.v VERSION AS OF $cMid")
      .first.getLong(0) === 13L) // old definition, new data
  }

  test("ALTER VIEW ... AS redefines in place as ONE atomic commit") {
    val cat = mkCat("gv4")
    spark.sql("CREATE VIEW gv4.v AS SELECT sum(n) AS total FROM gv4.t")
    val cView = Catalog.latestCommit(cat)
    spark.sql("ALTER VIEW gv4.v AS SELECT sum(n) * 10 AS total FROM gv4.t")
    assert(Catalog.latestCommit(cat) === cView + 1) // ONE commit
    assert(spark.sql("SELECT total FROM gv4.v").first.getLong(0) === 30L)
    // time travel still resolves the PRE-ALTER definition at its commit
    assert(spark.sql(s"SELECT total FROM gv4.v VERSION AS OF $cView")
      .first.getLong(0) === 3L)
    // SQL-standard contract: ALTER VIEW AS requires the view to exist
    intercept[Exception] {
      spark.sql("ALTER VIEW gv4.nope AS SELECT 1 AS one")
    }
    // a failed redefinition (bad query) leaves the existing view intact
    val cBefore = Catalog.latestCommit(cat)
    intercept[Exception] {
      spark.sql("ALTER VIEW gv4.v AS SELECT no_such_col FROM gv4.t")
    }
    assert(Catalog.latestCommit(cat) === cBefore)
    assert(spark.sql("SELECT total FROM gv4.v").first.getLong(0) === 30L)
  }

  test("expireCommits GCs unreferenced view-definition files with the manifests") {
    val cat = mkCat("gv5")
    spark.sql("CREATE VIEW gv5.v AS SELECT sum(n) AS total FROM gv5.t")
    spark.sql("ALTER VIEW gv5.v AS SELECT sum(n) * 2 AS total FROM gv5.t")
    spark.sql("ALTER VIEW gv5.v AS SELECT sum(n) * 3 AS total FROM gv5.t")
    val defsDir = java.nio.file.Paths.get(cat, "views", "v")
    def defs() = java.nio.file.Files.list(defsDir).iterator()
    import scala.jdk.CollectionConverters._
    assert(defs().asScala.size === 3)
    // retain nothing but the current commit: only the LIVE definition
    // survives (grace 0 — every older def is unreferenced)
    Catalog.expireCommits(cat, retainLast = 0, graceMs = 0L)
    assert(defs().asScala.map(_.getFileName.toString).toSeq === Seq("v=2"))
    assert(spark.sql("SELECT total FROM gv5.v").first.getLong(0) === 9L)
    // a DROPPED view's remaining defs (and its dir) go entirely
    spark.sql("DROP VIEW gv5.v")
    Catalog.expireCommits(cat, retainLast = 0, graceMs = 0L)
    assert(!java.nio.file.Files.exists(defsDir))
  }

  test("rollback rewinds view DDL like any commit; DROP is a commit") {
    val cat = mkCat("gv3")
    val c0 = Catalog.latestCommit(cat)
    spark.sql("CREATE VIEW gv3.v AS SELECT count(*) AS c FROM gv3.t")
    assert(spark.sql("SELECT c FROM gv3.v").first.getLong(0) === 2L)
    Catalog.rollback(cat, c0)
    intercept[Exception] { spark.sql("SELECT c FROM gv3.v").collect() }
    // re-create after rollback, then DROP = one more commit
    spark.sql("CREATE VIEW gv3.v AS SELECT count(*) AS c FROM gv3.t")
    val cBefore = Catalog.latestCommit(cat)
    spark.sql("DROP VIEW gv3.v")
    assert(Catalog.latestCommit(cat) === cBefore + 1)
    intercept[Exception] { spark.sql("SELECT c FROM gv3.v").collect() }
    // name collisions refuse in both directions
    intercept[Exception] {
      spark.sql("CREATE VIEW gv3.t AS SELECT 1 AS one")
    }
  }
}
