package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Bronze, Catalog, MaterializedView, SnapshotTable}
import graft.streaming.GovernedStream

/** Streaming materialized-view maintenance: exactly-once governed
  * bronze appends with a per-trigger view refresh through the
  * append-only fast path — the view equals a full re-aggregation
  * after every drain, survives restarts with new data, and a forced
  * replay double-counts nothing. */
class StreamingMvSpec extends GraftSuite {
  import spark.implicits._

  private def fullAgg(bronze: DataFrame): Set[(String, Long, BigDecimal)] =
    bronze.groupBy("product_id")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("price").cast("decimal(18,4)")).cast("decimal(28,4)")
          .as("price_sum"))
      .as[(String, Long, BigDecimal)].collect().toSet

  private def view(mvRoot: String): Set[(String, Long, BigDecimal)] =
    SnapshotTable.read(spark, mvRoot)
      .select("product_id", "n_rows", "price_sum")
      .as[(String, Long, BigDecimal)].collect().toSet

  test("stream -> governed appends -> fresh view; restart ingests only new files; replay is a no-op") {
    val tmp = Files.createTempDirectory("graft-mv-stream")
    val (src, cat, cp, mv) = (s"$tmp/src", s"$tmp/cat", s"$tmp/cp",
      s"$tmp/mv")
    val raw = spark.read.parquet(s"$sf/events.parquet")
    val half1 = raw.filter(col("event_id") % 2 === 0)
    val half2 = raw.filter(col("event_id") % 2 =!= 0)
    half1.repartition(2).write.mode("overwrite").parquet(src)

    GovernedStream.maintainViewGoverned(spark, src, cat, cp, mv,
      Seq("product_id"), Seq("price"))
    val root = Catalog.tableRoot(cat, "bronze")
    def bronzeNow: DataFrame = Catalog.read(spark, cat, "bronze")
    assert(view(mv) === fullAgg(bronzeNow))
    val rowsAfterFirst = bronzeNow.count()
    assert(rowsAfterFirst > 0)

    // restart with the second half landed: only new files ingest, the
    // view advances through the append-only fast path
    half2.repartition(2).write.mode("append").parquet(src)
    GovernedStream.maintainViewGoverned(spark, src, cat, cp, mv,
      Seq("product_id"), Seq("price"))
    assert(bronzeNow.count() > rowsAfterFirst)
    assert(view(mv) === fullAgg(bronzeNow))
    val settled = view(mv)
    val settledRows = bronzeNow.count()

    // forced replay: a FRESH checkpoint re-delivers everything; the
    // recorded batch ids skip the appends and the covered-version
    // anchor makes the refresh a no-op — nothing double-counts
    GovernedStream.maintainViewGoverned(spark, src, cat, s"$tmp/cp2", mv,
      Seq("product_id"), Seq("price"))
    assert(bronzeNow.count() === settledRows)
    assert(view(mv) === settled)

    // and the covered version is the published bronze version
    assert(MaterializedView.coveredBaseVersion(mv) ===
      Catalog.tableVersions(cat, Catalog.latestCommit(cat))("bronze"))
  }
}
