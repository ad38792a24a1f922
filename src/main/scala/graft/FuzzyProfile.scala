package graft

import org.apache.spark.sql.SparkSession

import graft.operators.{FuzzyJoin, SnapshotTable}

/** One-off profile runner for the fuzzy-join x100 attribution
  * (VERDICT r14 #2): measures the same self-join (p_name, d=2) three
  * ways on one corpus — per-query-priced, and sidecar-planned (zero
  * pricing jobs) — so the pricing share of the wall is a subtraction
  * of measured runs, not a guess. Usage:
  *   runMain graft.FuzzyProfile <sfDir> [reps=3]
  */
object FuzzyProfile {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    val part = spark.read.parquet(s"$dir/part.parquet")
    // per-query priced (the bench key's exact shape)
    val priced = (1 to reps).map { _ =>
      spark.catalog.clearCache()
      val (w, n) = timed(
        FuzzyJoin.selfPairs(part, "p_name", maxDist = 2).count())
      println(s"[fuzzyprofile] priced: $w s ($n pairs)")
      w
    }
    // stored: sidecar built once (untimed), then zero-pricing queries
    val root = java.nio.file.Files
      .createTempDirectory("graft-fuzzy-prof").toString + "/t"
    SnapshotTable.commit(part.select("p_partkey", "p_name"), root)
    val tSide = timed {
      FuzzyJoin.collectGramStats(spark, root, "p_name", maxDist = 2)
    }
    println(s"[fuzzyprofile] collectGramStats: ${tSide._1} s")
    val stored = (1 to reps).map { _ =>
      spark.catalog.clearCache()
      FuzzyJoin.pricingJobs.set(0L)
      val (w, n) = timed(
        FuzzyJoin.selfPairsStored(spark, root, "p_name", maxDist = 2)
          .count())
      println(s"[fuzzyprofile] stored: $w s ($n pairs, " +
        s"pricingJobs=${FuzzyJoin.pricingJobs.get()})")
      w
    }
    println(f"[fuzzyprofile] MEDIANS priced=${med(priced)}%.2f " +
      f"stored=${med(stored)}%.2f " +
      f"pricingShare=${med(priced) - med(stored)}%.2f " +
      f"sidecarBuild=${tSide._1}%.2f")
    spark.stop()
  }
}
