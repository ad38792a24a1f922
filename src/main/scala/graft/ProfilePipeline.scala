package graft

import org.apache.spark.sql.SparkSession

/** Dev-only profiling main: run PipelineRun.run once against
  * SPARK_GRAFT_SF_DIR and print the per-stage report (stage, rows,
  * seconds, attempts) — the attribution view behind the
  * pipeline_end_to_end bench key. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    spark.sparkContext.setLogLevel("WARN")
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
    (1 to reps).foreach { i =>
      val out = java.nio.file.Files
        .createTempDirectory(s"graft-profile-pipe$i").toString
      val t0 = System.nanoTime()
      val report = operators.PipelineRun.run(spark, sfDir, out)
      val rows = report.collect()
      val total = (System.nanoTime() - t0) / 1e9
      println(s"=== rep $i total ${f"$total%.2f"}s ===")
      rows.foreach { r =>
        println(f"${r.getAs[String]("stage")}%-16s ${r.getAs[Double]("seconds")}%7.2f s  ${r.getAs[Long]("rows")}%10d rows")
      }
      spark.sharedState.cacheManager.clearCache()
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
    }
    spark.stop()
  }
}
