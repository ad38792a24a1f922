package graft

import org.apache.spark.sql.SparkSession

/** Dev-only phase attribution for the hybrid_search_stored bench key
  * (same code path as SparkEntry's entry): times the snapshot commit,
  * the full index build, the IVF append, and the serve query
  * separately — written for the r17 core-count scaling question (the
  * key measured flat 8-vs-32-core at x100, and the phase split says
  * which stage is the non-parallel one). */
object ProfileHybrid {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"[prof] $name%-22s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val roots = Seq.newBuilder[String]
    (1 to 2).foreach { rep =>
      println(s"=== rep $rep ===")
      val base = java.nio.file.Files
        .createTempDirectory("graft-prof-hybrid").toString
      roots += base
      val docsRoot = s"$base/docs"
      val ivfRoot = s"$base/ivf"
      t("commit docs")(operators.SnapshotTable.commit(
        sources.Tables.documents(spark, dir), docsRoot))
      t("indexCorpus")(operators.Retrieval.indexCorpus(spark, docsRoot))
      t("ivf appendBatch")(operators.IncrementalIvf.appendBatch(spark, ivfRoot,
        sources.Tables.embeddings(spark, dir).select("vec_id", "embedding")))
      t("hybrid serve")(operators.Retrieval.hybridSearchStored(spark,
        docsRoot, ivfRoot, sources.Tables.embeddings(spark, dir))
        .write.format("noop").mode("overwrite").save())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
    roots.result().foreach(r =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(r)))
  }
}
