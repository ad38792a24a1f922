package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scratch profiler for the data_quality chain (dev only). */
object ProfDq {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.operators._
    if (args.contains("full")) {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries("data_quality")(spark, dir).count()
        println(f"PROFDQ full_query_$i ${(System.nanoTime() - t0) / 1e9}%8.2f s rows=$n")
        spark.sharedState.cacheManager.clearCache()
      }
      spark.stop(); return
    }
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"PROFDQ $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    def mat(name: String, df: DataFrame): DataFrame =
      t(name) { val p = df.persist(); p.count(); p }

    val bd = mat("bronze_dup",
      Bronze.withRedeliveries(Bronze.ingest(graft.sources.Tables.events(spark, dir))))
    val sv = mat("silver", BronzeToSilver.transform(bd))
    val st = mat("stg", Staging.stgTrades(sv))
    val m1 = mat("ohlcv_1m", Ohlcv.ohlcv1m(st))
    val h1 = mat("ohlcv_1h", Ohlcv.ohlcv1h(m1))
    val dm = mat("daily", DailyMetrics.daily(h1))
    val pl = t("price_latest_build") { PriceLatest.latest(st, m1, h1, dm) }
    t("bronze_report")(DataQuality.bronzeReport(bd).count())
    t("silver_report")(DataQuality.silverReport(sv).count())
    t("freshness")(DataQuality.freshnessReport(sv).count())
    t("gold_m1")(DataQuality.report("ohlcv_1m", m1, DataQuality.ohlcvChecks).count())
    t("gold_h1")(DataQuality.report("ohlcv_1h", h1, DataQuality.ohlcvChecks).count())
    t("gold_dm")(DataQuality.report("daily_metrics", dm, DataQuality.dailyMetricsChecks).count())
    t("gold_pl")(DataQuality.report("price_latest", pl, DataQuality.priceLatestChecks).count())
    spark.stop()
  }
}
