package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress data generator: replicate a testdata directory N×
  * with RE-KEYED ids — fact/event/document keys shift per copy so the
  * result is a ~N× corpus with the same per-copy structure (dimension
  * tables copy once; foreign keys into them stay valid). Used by the
  * round-11 scale bench: run `graft.Bench` with
  * `SPARK_GRAFT_SF_DIR=<out>` on the 15 most expensive keys and
  * compare against the sf0.1 run — wall time must grow ≤~linearly and
  * plan shapes must hold.
  *
  *   runMain graft.ScaleData <srcDir> <outDir> [copies=10]
  *
  * Deliberately NOT content-mutating: exact-dup groups grow N-way
  * (realistic for `dedup_exact`); the quadratic-by-workload near-dup
  * keys (ngram/minhash) are excluded from the scale list instead —
  * N-plicating every document multiplies their CANDIDATE PAIRS by N²
  * by construction, which measures the workload change, not the
  * engine. */
object ScaleData {

  def main(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    replicate(spark, src, out, copies)
    spark.stop()
  }

  /** Shift-keys per table: (key column, additional columns to shift by
    * the SAME stride — lineitem's orderkey must track orders'). */
  private val FactKeys: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def replicate(spark: SparkSession, src: String, out: String,
                copies: Int): Unit = {
    val dims = Seq("region", "nation", "customer", "supplier", "part")
    dims.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    // one stride across orders+lineitem so the FK keeps joining
    val orderStride = spark.read.parquet(s"$src/orders.parquet")
      .agg(max("o_orderkey")).head.getLong(0) + 1L
    FactKeys.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val stride = t match {
        case "orders" | "lineitem" => orderStride
        case _ => df.agg(max(col(keys.head))).head.getLong(0) + 1L
      }
      val copiesDf: DataFrame = (0 until copies).map { i =>
        keys.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i.toLong * stride)))
      }.reduce(_ unionByName _)
      copiesDf.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaledata] $t x$copies (stride $stride)")
    }
  }
}
