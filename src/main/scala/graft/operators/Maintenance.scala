package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table maintenance.
  *
  * The reference calls Iceberg's `rewrite_data_files` / snapshot expiry
  * procedures (`processing/spark_jobs/compaction.py:30-80`). Without an
  * ACID table format on the classpath, the same operational concern —
  * small-file compaction — is implemented as a parquet directory
  * rewrite to a target file count, preserving every row.
  *
  * Scale: `repartition(n)` is a single round-robin shuffle sized to the
  * target file count; for a partitioned table a deployment would run
  * this per partition (the driver loop is over partitions, the data
  * path stays distributed).
  */
object Maintenance {

  /** Rewrite `inputDir` (parquet) into `outputDir` with `targetFiles`
    * files. Returns the row count written. */
  def compact(spark: SparkSession, inputDir: String, outputDir: String,
              targetFiles: Int): Long = {
    val df = spark.read.parquet(inputDir)
    df.repartition(targetFiles).write.mode("overwrite").parquet(outputDir)
    spark.read.parquet(outputDir).count()
  }

  /** Compaction plan: how many files a directory currently has vs the
    * target — the "min-input-files" gate the reference passes to
    * rewrite_data_files. */
  def needsCompaction(spark: SparkSession, inputDir: String,
                      minInputFiles: Int): Boolean = {
    val files = spark.read.parquet(inputDir).inputFiles
    files.length >= minInputFiles
  }

  /** Snapshot-expiry analog for plain parquet output dirs: list versions
    * (subdirectories named by monotonically increasing snapshot id) and
    * return those older than `retainLast`. Pure planning helper — the
    * caller performs deletion. */
  def expiredSnapshots(versions: Seq[Long], retainLast: Int): Seq[Long] =
    versions.sorted.dropRight(retainLast)
}
