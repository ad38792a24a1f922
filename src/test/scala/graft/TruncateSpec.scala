package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.SnapshotTable

/** TRUNCATE TABLE + the emptied-table read path: deleting EVERY row
  * (deleteWhere over an always-true predicate, or SQL TRUNCATE) leaves
  * a manifested version with zero entries — readable as an empty frame
  * under the recorded schema, appendable afterwards, old versions
  * time-travelable. */
class TruncateSpec extends GraftSuite {
  import spark.implicits._

  test("deleteWhere emptying EVERY partition keeps the table readable") {
    val root = Files.createTempDirectory("graft-trunc-lib").toString
    SnapshotTable.commitDelta(
      Seq((1L, "a"), (2L, "b")).toDF("id", "p"), root, "p")
    SnapshotTable.deleteWhere(spark, root, "p", lit(true))
    val empty = SnapshotTable.read(spark, root)
    assert(empty.count() === 0 && empty.columns.toSeq === Seq("id", "p"))
    // appends land normally on the emptied base
    SnapshotTable.commitAppend(Seq((3L, "a")).toDF("id", "p"), root, "p")
    assert(SnapshotTable.read(spark, root).select("id").as[Long]
      .collect().toSeq === Seq(3L))
    // pre-truncate versions still read
    assert(SnapshotTable.read(spark, root, 0L).count() === 2)
  }

  test("SQL TRUNCATE TABLE empties, stays insertable, rolls back") {
    val wh = Files.createTempDirectory("graft-trunc-sql").toString
    spark.conf.set("spark.sql.catalog.twh", "graft.sources.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.twh.warehouse", wh)
    try {
      spark.sql("CREATE TABLE twh.db.t (k STRING, n BIGINT) PARTITIONED BY (k)")
      spark.sql("INSERT INTO twh.db.t VALUES ('a', 1), ('b', 2)")
      val before = SnapshotTable.latestVersion(s"$wh/db/t")
      spark.sql("TRUNCATE TABLE twh.db.t")
      assert(spark.sql("SELECT count(*) FROM twh.db.t").first().getLong(0)
        === 0)
      assert(spark.table("twh.db.t").columns.toSeq === Seq("k", "n"))
      spark.sql("INSERT INTO twh.db.t VALUES ('c', 3)")
      assert(spark.sql("SELECT sum(n) FROM twh.db.t").first().getLong(0)
        === 3)
      // truncation is a commit: time travel and rollback keep the rows
      assert(spark.sql(
        s"SELECT count(*) FROM twh.db.t VERSION AS OF $before")
        .first().getLong(0) === 2)
      spark.sql(s"CALL twh.system.rollback('db.t', $before)")
      assert(spark.sql("SELECT count(*) FROM twh.db.t").first().getLong(0)
        === 2)
    } finally spark.conf.unset("spark.sql.catalog.twh")
  }

  test("TRUNCATE of a flat (CTAS) snapshot commits an empty version") {
    val wh = Files.createTempDirectory("graft-trunc-flat").toString
    spark.conf.set("spark.sql.catalog.twf", "graft.sources.GraftSqlCatalog")
    spark.conf.set("spark.sql.catalog.twf.warehouse", wh)
    try {
      spark.sql("CREATE TABLE twf.db.f AS SELECT 1 AS a, 'x' AS b")
      spark.sql("TRUNCATE TABLE twf.db.f")
      assert(spark.sql("SELECT count(*) FROM twf.db.f").first().getLong(0)
        === 0)
      assert(spark.table("twf.db.f").columns.toSeq === Seq("a", "b"))
    } finally spark.conf.unset("spark.sql.catalog.twf")
  }
}
