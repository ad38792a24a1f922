package graft

import java.nio.file.Files

import graft.operators.SnapshotTable

/** Persisted SQL views on the warehouse catalog (the Trino-view / dbt
  * `materialized=view` surface): CREATE/SELECT/SHOW/DROP VIEW DDL
  * rerouted by the graft parser, definitions substituted at read time
  * under the view's stored context (late binding). */
class GraftViewSpec extends GraftSuite {

  private lazy val wh: String = {
    val w = Files.createTempDirectory("graft-views-wh").toString
    spark.conf.set("spark.sql.catalog.vtest", "graft.sources.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.vtest.warehouse", w)
    spark.sql("CREATE TABLE vtest.db.t (k STRING, n BIGINT) PARTITIONED BY (k)")
    spark.sql("INSERT INTO vtest.db.t VALUES ('a', 1), ('b', 2), ('a', 3)")
    w
  }

  test("CREATE VIEW persists; SELECT resolves the stored definition") {
    wh
    spark.sql("CREATE VIEW vtest.db.totals AS " +
      "SELECT k, sum(n) AS total FROM vtest.db.t GROUP BY k")
    assert(spark.sql("SELECT * FROM vtest.db.totals ORDER BY k")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("a", 4L), ("b", 2L)))
    // late binding: the view sees rows written AFTER its creation
    spark.sql("INSERT INTO vtest.db.t VALUES ('b', 10)")
    assert(spark.sql("SELECT total FROM vtest.db.totals WHERE k = 'b'")
      .first().getLong(0) === 12L)
    // survives a fresh catalog instance (persisted, not session state)
    assert(Files.exists(java.nio.file.Paths.get(wh, "db", "totals", "_view")))
  }

  test("column aliases, OR REPLACE, IF NOT EXISTS, DROP") {
    wh
    spark.sql("CREATE VIEW vtest.db.aliased (grp, cnt) AS " +
      "SELECT k, count(*) FROM vtest.db.t GROUP BY k")
    val df = spark.sql("SELECT grp, cnt FROM vtest.db.aliased ORDER BY grp")
    assert(df.columns.toSeq === Seq("grp", "cnt"))
    assert(df.count() === 2)
    // OR REPLACE swaps the definition
    spark.sql("CREATE OR REPLACE VIEW vtest.db.aliased AS " +
      "SELECT k FROM vtest.db.t WHERE n > 100")
    assert(spark.sql("SELECT * FROM vtest.db.aliased").count() === 0)
    // IF NOT EXISTS keeps the current definition
    spark.sql("CREATE VIEW IF NOT EXISTS vtest.db.aliased AS " +
      "SELECT 1 AS one")
    assert(spark.sql("SELECT * FROM vtest.db.aliased").columns.toSeq ===
      Seq("k"))
    // plain CREATE over an existing view refuses
    intercept[Exception] {
      spark.sql("CREATE VIEW vtest.db.aliased AS SELECT 1 AS one")
    }
    spark.sql("DROP VIEW vtest.db.aliased")
    intercept[Exception] {
      spark.sql("SELECT * FROM vtest.db.aliased").collect()
    }
    spark.sql("DROP VIEW IF EXISTS vtest.db.aliased") // no-op, no throw
    intercept[Exception] { // without IF EXISTS: loud
      spark.sql("DROP VIEW vtest.db.aliased")
    }
  }

  test("views nest; SHOW VIEWS lists; tables and views never collide") {
    wh
    spark.sql("CREATE VIEW vtest.db.base_v AS " +
      "SELECT k, n * 2 AS n2 FROM vtest.db.t")
    spark.sql("CREATE VIEW vtest.db.nested_v AS " +
      "SELECT k, sum(n2) AS total2 FROM vtest.db.base_v GROUP BY k")
    assert(spark.sql("SELECT total2 FROM vtest.db.nested_v WHERE k = 'a'")
      .first().getLong(0) === 8L)
    val shown = spark.sql("SHOW VIEWS IN vtest.db").collect()
      .map(_.getString(1)).toSet
    assert(shown.contains("base_v") && shown.contains("nested_v"))
    // a view cannot shadow a table, nor a table a view
    intercept[Exception] {
      spark.sql("CREATE VIEW vtest.db.t AS SELECT 1 AS one")
    }
    intercept[Exception] {
      spark.sql("CREATE TABLE vtest.db.base_v (x BIGINT) PARTITIONED BY (x)")
    }
    // and tables list separately from views
    assert(!spark.sql("SHOW TABLES IN vtest.db").collect()
      .map(_.getString(1)).contains("base_v"))
  }

  test("ALTER VIEW ... AS redefines a warehouse view in place") {
    wh
    spark.sql("CREATE VIEW vtest.db.alt_v AS " +
      "SELECT sum(n) AS total FROM vtest.db.t")
    val before = spark.sql("SELECT total FROM vtest.db.alt_v")
      .first().getLong(0)
    spark.sql("ALTER VIEW vtest.db.alt_v AS " +
      "SELECT sum(n) * 100 AS total FROM vtest.db.t")
    assert(spark.sql("SELECT total FROM vtest.db.alt_v")
      .first().getLong(0) === before * 100)
    // the view must exist (else CREATE OR REPLACE is the tool)
    intercept[Exception] {
      spark.sql("ALTER VIEW vtest.db.no_such_v AS SELECT 1 AS one")
    }
    spark.sql("DROP VIEW vtest.db.alt_v")
  }

  test("CTE names inside a definition never re-qualify; failed OR REPLACE keeps the view") {
    wh
    // the CTE's self-reference must NOT become vtest.db.c at read time
    spark.sql("CREATE VIEW vtest.db.cte_v AS " +
      "WITH c AS (SELECT k, n FROM vtest.db.t WHERE n > 1) " +
      "SELECT k, sum(n) AS total FROM c GROUP BY k")
    assert(spark.sql("SELECT sum(total) FROM vtest.db.cte_v")
      .first().getLong(0) ===
      spark.sql("SELECT sum(n) FROM vtest.db.t WHERE n > 1")
        .first().getLong(0))
    // a replacement whose query fails analysis leaves the old view
    intercept[Exception] {
      spark.sql("CREATE OR REPLACE VIEW vtest.db.cte_v AS " +
        "SELECT no_such_column FROM vtest.db.t")
    }
    assert(spark.sql("SELECT * FROM vtest.db.cte_v").columns.toSeq ===
      Seq("k", "total"))
  }

  test("DDL aimed at temp views or other catalogs is never hijacked") {
    wh
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name()
    spark.sql("USE vtest.db")
    try {
      // a TEMP view drop under a graft current catalog stays Spark's
      spark.range(1).createOrReplaceTempView("hijack_tmp")
      spark.sql("DROP VIEW hijack_tmp")
      assert(spark.sessionState.catalog.getTempView("hijack_tmp").isEmpty)
      // an explicit other-catalog identifier falls through untouched
      intercept[Exception] { // session catalog: no such view → ITS error
        spark.sql("DROP VIEW spark_catalog.default.never_created")
      }
      assert(!java.nio.file.Files.exists(
        java.nio.file.Paths.get(wh, "spark_catalog")))
    } finally spark.sql(s"USE $prevCat")
  }

  test("late binding under the STORED context: unqualified names re-qualify") {
    wh
    val prevCat = spark.sessionState.catalogManager.currentCatalog.name()
    spark.sql("USE vtest.db")
    try {
      // the definition references bare `t` — resolvable only because
      // the view stores its creation context
      spark.sql("CREATE VIEW ctx_v AS SELECT count(*) AS n_rows FROM t")
    } finally spark.sql(s"USE $prevCat")
    assert(spark.sql("SELECT n_rows FROM vtest.db.ctx_v").first().getLong(0)
      === spark.sql("SELECT count(*) FROM vtest.db.t").first().getLong(0))
  }
}
