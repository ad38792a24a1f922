package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query wall
  * seconds. Queries are fully materialized through the noop sink (a
  * `count()` would let Spark prune projections and skip expression
  * work); failures are reported per-query in `errors` instead of
  * masquerading as fast runs.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // JVM/codegen warm-up so the first timed query doesn't absorb
    // session initialization (broadcast machinery, parquet readers)
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    spark.sharedState.cacheManager.clearCache()

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
        catch { case e: Throwable =>
          Some(Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // drop per-query persisted stages so queries are isolated
      // (teardown is deliberately NOT charged to the query's time)
      spark.sharedState.cacheManager.clearCache()
      (name, elapsed, err)
    }
    def jq(s: String): String = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
    val qs = results.map { case (k, v, _) => s"${jq(k)}:$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${jq(k)}:${jq(e)}" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
