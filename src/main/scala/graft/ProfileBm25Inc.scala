package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only phase attribution for the bm25_incremental bench key:
  * times each staging/maintenance step of the key's body separately
  * (same code path as SparkEntry's entry). */
object ProfileBm25Inc {
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
      val out = java.nio.file.Files
        .createTempDirectory("graft-prof-bm25inc").toString + "/t"
      roots += out
      val docs = sources.Tables.documents(spark, dir)
      val r = t("minmax")(docs.agg(min("doc_id"), max("doc_id")).head())
      val cut = (r.getLong(0) + r.getLong(1)) / 2L
      t("commitAppend v0")(operators.SnapshotTable.commitAppend(
        docs.filter(col("doc_id") <= cut), out, "source"))
      t("indexCorpus v0")(operators.Retrieval.indexCorpus(spark, out))
      t("commitAppend v1")(operators.SnapshotTable.commitAppend(
        docs.filter(col("doc_id") > cut), out, "source"))
      t("indexCorpusDelta v1")(operators.Retrieval.indexCorpusDelta(spark, out))
      val batch = docs.filter(pmod(col("doc_id"), lit(7L)) === 3L)
        .withColumn("text", concat(col("text"), lit(" merge vector merge")))
      t("upsertMor")(operators.SnapshotTable.upsertMor(
        spark, out, "source", batch, Seq("doc_id")))
      t("indexCorpusDelta v2")(operators.Retrieval.indexCorpusDelta(spark, out))
      t("bm25SearchStored")(operators.Retrieval.bm25SearchStored(spark, out)
        .write.format("noop").mode("overwrite").save())
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
    // temp snapshot tables cleaned up after the session releases them
    // (mirrors ProfilePipeline — repeated dev runs must not leak disk)
    roots.result().foreach(r =>
      org.apache.commons.io.FileUtils.deleteQuietly(
        new java.io.File(r).getParentFile))
  }
}
