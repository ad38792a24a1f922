package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor (dev only): prints formatted plans for the headline
  * queries so pushdown / broadcast / shuffle counts can be reviewed. */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority",
        "q5_region_revenue", "ohlcv_1m", "silver_dedup", "price_latest")
    names.foreach { n =>
      println(s"\n================ $n ================")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
