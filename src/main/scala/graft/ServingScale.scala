package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, SnapshotTable}
import graft.sources.Tables

/** SERVING-decade scale measurement (round 15): how the two serving
  * surfaces behave when the STORED data grows 100× —
  *
  *  - `bm25_stored`: query wall over a 100× document corpus via the
  *    inverted-index sidecar vs the corpus-scan path. The stored path
  *    still reads every QUERY-TERM posting (BM25 scores all matching
  *    docs), so it scales with the matching set — the claim under
  *    test is the CONSTANT: no tokenize, no vocab-wide df aggregate,
  *    no doc join at query time.
  *  - `topn_serving`: `ORDER BY key DESC LIMIT k` over a 100× serving
  *    table — the file-prefix pruning claim is ~FLAT wall (the kept
  *    prefix depends on k and file widths, not on table size).
  *
  * Emits one JSON line; medians of 3 reps, corpus replicated with
  * re-keyed ids (ScaleData's stride rule).
  *
  *   runMain graft.ServingScale <sfDir> <workDir>
  */
object ServingScale {

  private def timeMedian(reps: Int)(body: => Unit): Double = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }.sorted
    ts(ts.size / 2)
  }

  /** ScaleData's stride rule inline for one keyed table: N copies
    * with the id column shifted by `i × (max+1)`. */
  private def replicate(df: DataFrame, idCol: String,
                        copies: Int): DataFrame = {
    val stride = df.agg(max(idCol)).head.getLong(0) + 1L
    (0 until copies).map(i =>
      df.withColumn(idCol, col(idCol) + lit(i.toLong * stride)))
      .reduce(_ unionByName _)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, work) = args.take(2)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-serving-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // NOTE: no spark.driver.memory here — in local mode the JVM is
      // already up (sbt), so the heap is SPARK_DRIVER_MEM via build.sbt
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Double]

    Seq(1, 100).foreach { copies =>
      val tag = s"x$copies"
      // ── bm25: corpus written once per decade, indexed once ──
      val docsSrc = Tables.documents(spark, sfDir)
      val docs =
        if (copies == 1) docsSrc else replicate(docsSrc, "doc_id", copies)
      val bmRoot = s"$work/bm25_$tag/t"
      SnapshotTable.commit(
        docs.repartitionByRange(32, col("doc_id")), bmRoot)
      out(s"index_build_$tag") = timeMedian(1) {
        Retrieval.indexCorpus(spark, bmRoot)
      }
      out(s"bm25_scan_$tag") = timeMedian(3) {
        Retrieval.bm25Search(
          SnapshotTable.read(spark, bmRoot, 0L)).collect()
      }
      out(s"bm25_stored_$tag") = timeMedian(3) {
        Retrieval.bm25SearchStored(spark, bmRoot).collect()
      }
      // ── topn: ts-ordered serving table, stats + ndv sidecars ──
      val evSrc = Tables.events(spark, sfDir)
        .select("event_id", "user_id", "event_type", "value")
      val ev =
        if (copies == 1) evSrc else replicate(evSrc, "event_id", copies)
      val tRoot = s"$work/topn_$tag/t"
      SnapshotTable.setNdvColumns(tRoot, Seq("event_id"))
      SnapshotTable.commit(
        ev.repartitionByRange(if (copies == 1) 8 else 256,
          col("event_id")),
        tRoot, statsCols = Seq("event_id"))
      out(s"topn_$tag") = timeMedian(3) {
        spark.read.format("graft").load(tRoot)
          .orderBy(desc("event_id")).limit(100).collect()
      }
    }

    val fields = out.map { case (k, v) =>
      s""""$k": ${math.rint(v * 1000) / 1000}""" }.mkString(", ")
    println(s"""{"metric": "serving_scale", $fields}""")
    spark.stop()
  }
}
