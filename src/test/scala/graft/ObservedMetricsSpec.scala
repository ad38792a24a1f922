package graft

import org.apache.spark.sql.functions._

/** Pins the mechanism PipelineRun's watermark/as-of scalars ride on:
  * `Dataset.observe` metrics ARE delivered for V1 file-write commands
  * (plain and partitioned), so the pipeline never pays a separate
  * aggregate job for them; `Metrics.observedOr`'s fallback covers any
  * engine where this stops holding. */
class ObservedMetricsSpec extends GraftSuite {
  test("observation fires on a V1 parquet write command") {
    val obs = new org.apache.spark.sql.Observation()
    val dir = java.nio.file.Files.createTempDirectory("obs-check").toString
    spark.range(100).toDF("x")
      .observe(obs, max(col("x")).as("mx"))
      .write.mode("overwrite").parquet(s"$dir/t")
    val got = graft.operators.Metrics.observedOr[Long](spark, obs, "mx")(-1L)
    println(s"OBSERVED VALUE: $got")
    assert(got === 99L, s"observation did not fire (got $got)")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
  test("observation fires on a partitioned V1 parquet write") {
    val obs = new org.apache.spark.sql.Observation()
    val dir = java.nio.file.Files.createTempDirectory("obs-check2").toString
    spark.range(100).toDF("x").withColumn("p", col("x") % 3)
      .observe(obs, max(col("x")).as("mx"))
      .write.mode("overwrite").partitionBy("p").parquet(s"$dir/t")
    val got = graft.operators.Metrics.observedOr[Long](spark, obs, "mx")(-1L)
    println(s"OBSERVED VALUE (partitioned): $got")
    assert(got === 99L, s"observation did not fire (got $got)")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }
}
