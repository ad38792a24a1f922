package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.TrainingExport
import graft.sources.Tables

/** Training export: the deterministic shuffle/shard/pack plan, the
  * materialized shard layout, and the manifest a trainer resumes
  * from. */
class TrainingExportSpec extends GraftSuite {

  private lazy val docs = Tables.documents(spark, sf).cache()

  test("plan is a deterministic permutation: stable across runs, shards balanced, packs fill") {
    val p1 = TrainingExport.plan(docs, shards = 8, contextTokens = 512)
    val p2 = TrainingExport.plan(
      docs.repartition(7), shards = 8, contextTokens = 512)
    // same permutation regardless of input partitioning
    assert(p1.collect().toSet === p2.collect().toSet)

    val byShard = p1.groupBy("shard").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byShard.keySet.subsetOf((0L until 8L).toSet))
    // md5 assignment balances shards (generous noise bound)
    val n = docs.count()
    byShard.values.foreach { c =>
      assert(c > n / 8 / 2 && c < n / 8 * 2, byShard)
    }
    // every non-final pack of a shard holds at least a full context
    // of cumulative tokens by the greedy rule: pack_id increments
    // exactly when the running total crosses a 512 boundary
    val bad = p1.groupBy("shard", "pack_id")
      .agg(sum("ws_tokens").as("t")).join(
        p1.groupBy("shard").agg(max("pack_id").as("last")), Seq("shard"))
      .filter(col("pack_id") < col("last") &&
        col("t") < lit(512 / 2)) // short doc spill-over keeps packs near-full
      .count()
    assert(bad === 0)
  }

  test("export writes one dir per shard, rereads to the corpus, manifest matches") {
    val out = Files.createTempDirectory("graft-train-exp").toString
    val m = TrainingExport.export(spark, docs, out,
      shards = 4, contextTokens = 512)

    val shardDirs = new java.io.File(s"$out/data").listFiles()
      .filter(_.getName.startsWith("shard=")).map(_.getName).sorted
    assert(shardDirs.length === 4)

    val back = spark.read.parquet(s"$out/data")
    assert(back.count() === docs.count())
    assert(back.select("doc_id").distinct().count() === docs.count())
    // each document carries its text next to its plan columns
    val joined = back.join(docs.withColumnRenamed("text", "orig"),
      Seq("doc_id"))
    assert(joined.filter(col("text") =!= col("orig")).count() === 0)

    // manifest totals = plan totals
    import spark.implicits._
    val totals = m.agg(sum("n_docs"), sum("shard_tokens"))
      .as[(Long, Long)].first()
    val planTotals = TrainingExport.plan(docs, 4, 512)
      .agg(count(lit(1)), sum("ws_tokens")).as[(Long, Long)].first()
    assert(totals === planTotals)
    m.collect().foreach { r =>
      // a document packs where it STARTS, so a straddling doc can push
      // a pack past the context size — fill hovers around 1
      val fill = r.getAs[Double]("fill_ratio")
      assert(fill > 0.5 && fill < 1.5, s"fill=$fill")
    }
  }

  test("the one exchange: shuffle, pack and manifest share a single shard partitioning") {
    val p = TrainingExport.plan(docs, shards = 8, contextTokens = 512)
    val plan = p.queryExecution.executedPlan.toString
    // exactly one real exchange (the shard hash partitioning); the
    // pack window rides it
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges === 1, plan)
  }
}
