package graft

import org.apache.spark.sql.SparkSession

/** Scratch stage profiler (dev only). */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"PROF $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
      spark.sharedState.cacheManager.clearCache()
    }
    val docs = graft.sources.Tables.documents(spark, dir)
    val emb = graft.sources.Tables.embeddings(spark, dir)
    if (args.contains("clusters")) {
      (1 to 3).foreach { _ =>
        time("clusters")(operators.Dedup.clusters(operators.Dedup.ngramJaccard(docs)))
      }
      spark.stop(); return
    }
    time("shingled")(operators.Dedup.shingled(docs))
    time("minhash_full")(operators.Dedup.minhashLsh(docs))
    time("simhash_full")(operators.Dedup.simhash(docs))
    time("ngram_capped")(operators.Dedup.ngramJaccard(docs))
    time("ngram_uncapped")(operators.Dedup.ngramJaccard(docs, maxDocFreq = None))
    time("emb_neardup_full")(operators.Similarity.nearDupPairs(emb))
    time("ann_topk_full")(operators.Similarity.annTopK(emb))
    spark.stop()
  }
}
