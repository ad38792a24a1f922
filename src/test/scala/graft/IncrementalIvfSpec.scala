package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{IncrementalIvf, Similarity, SnapshotTable}

/** Persisted IVF index: batch appends, frozen quantizer, pruned
  * probes — equivalent to the one-shot ivfTopK over the union. */
class IncrementalIvfSpec extends GraftSuite {

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")

  test("two appends then search equals one-shot ivfTopK over the union") {
    val root = Files.createTempDirectory("graft-ivf-inc").toString
    val b1 = emb.filter(col("vec_id") % 2 === 0)
    val b2 = emb.filter(col("vec_id") % 2 =!= 0)
    // first append seeds the quantizer with the BATCH's lowest ids —
    // pass the full-corpus rule explicitly so the one-shot twin matches
    val quant = Similarity.withNorms(emb)
      .filter(col("vec_id") < 16)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("ct_embedding"), col("nrm").as("ct_nrm"))
    IncrementalIvf.appendBatch(spark, root, b1, quantizer = Some(quant))
    IncrementalIvf.appendBatch(spark, root, b2)

    val queries = emb.filter(col("vec_id") < 10)
    val inc = IncrementalIvf.search(spark, root, queries)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val oneShot = Similarity.ivfTopK(emb)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(inc === oneShot)
  }

  test("replayed append adds no rows; later quantizer throws") {
    val root = Files.createTempDirectory("graft-ivf-replay").toString
    val b = emb.filter(col("vec_id") < 200)
    IncrementalIvf.appendBatch(spark, root, b)
    val n1 = SnapshotTable.read(spark, s"$root/lists").count()
    val v1 = SnapshotTable.latestVersion(s"$root/lists")
    IncrementalIvf.appendBatch(spark, root, b) // replay
    assert(SnapshotTable.read(spark, s"$root/lists").count() === n1)
    assert(SnapshotTable.latestVersion(s"$root/lists") === v1)
    val quant = Similarity.withNorms(emb).filter(col("vec_id") < 4)
      .select(col("vec_id").as("centroid_id"),
        col("embedding").as("ct_embedding"), col("nrm").as("ct_nrm"))
    intercept[IllegalArgumentException] {
      IncrementalIvf.appendBatch(spark, root,
        emb.filter(col("vec_id") >= 200), quantizer = Some(quant))
    }
  }

  test("an empty first batch cannot brick the index: creation throws") {
    val root = Files.createTempDirectory("graft-ivf-empty").toString
    // committing an empty quantizer would silently index nothing forever
    // (zero centroids to assign against, and the exists-guard forbids
    // ever supplying a real one) — creation must fail loudly instead
    intercept[IllegalArgumentException] {
      IncrementalIvf.appendBatch(spark, root, emb.filter(col("vec_id") < 0))
    }
    assert(SnapshotTable.latestVersion(s"$root/centroids") < 0)
    // a real first batch afterwards creates the index normally
    IncrementalIvf.appendBatch(spark, root, emb.filter(col("vec_id") < 100))
    assert(SnapshotTable.read(spark, s"$root/lists").count() === 100)
  }

  test("search scans only the probed partitions") {
    val root = Files.createTempDirectory("graft-ivf-prune").toString
    IncrementalIvf.appendBatch(spark, root, emb)
    val nLists = IncrementalIvf.readCentroids(spark, root).count()
    // AQE wraps the plan and hides the scan node from collect(); the
    // pruning is static (literal isin), so assert it with AQE off
    val saved = spark.conf.getOption("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val res = IncrementalIvf.search(spark, root,
        emb.filter(col("vec_id") === 42), nprobe = 2)
      val scans = res.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
            if f.output.exists(_.name == "centroid_id") => f
      }
      assert(scans.nonEmpty && scans.forall(_.partitionFilters.nonEmpty))
      assert(scans.map(_.selectedPartitions.partitionCount).max <= 2)
      assert(nLists > 2) // pruning actually dropped partitions
      assert(res.count() > 0)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.adaptive.enabled", v)
      case None    => spark.conf.unset("spark.sql.adaptive.enabled")
    }
  }

  test("rebalance rolls a retrained index side-by-side; alias flips atomically") {
    val tmp = Files.createTempDirectory("graft-ivf-reb").toString
    val (oldRoot, newRoot, alias) = (s"$tmp/idx0", s"$tmp/idx1", s"$tmp/alias")
    IncrementalIvf.appendBatch(spark, oldRoot,
      emb.filter(col("vec_id") % 2 === 0))
    IncrementalIvf.appendBatch(spark, oldRoot,
      emb.filter(col("vec_id") % 2 =!= 0))
    IncrementalIvf.swapAlias(alias, oldRoot)

    val stats = IncrementalIvf.listStats(spark, oldRoot)
    assert(stats.columns.toSet ===
      Set("centroid_id", "n_vectors", "balance_ratio"))
    assert(stats.agg(org.apache.spark.sql.functions.sum("n_vectors"))
      .first.getLong(0) === emb.count())

    IncrementalIvf.rebalance(spark, oldRoot, newRoot)
    // the old index keeps serving until the flip
    assert(IncrementalIvf.resolveAlias(alias) === oldRoot)
    IncrementalIvf.swapAlias(alias, newRoot)
    assert(IncrementalIvf.resolveAlias(alias) === newRoot)

    // every vector survived the rebuild, and the rolled index answers
    // queries with the exact per-list ranking semantics
    val served = IncrementalIvf.resolveAlias(alias)
    assert(SnapshotTable.read(spark, s"$served/lists").count() === emb.count())
    val queries = emb.filter(col("vec_id") < 5)
    val got = IncrementalIvf.search(spark, served, queries)
    assert(got.groupBy("query_id").count().collect()
      .forall(_.getLong(1) === 10))
    // flip back = instant rollback
    IncrementalIvf.swapAlias(alias, oldRoot)
    assert(IncrementalIvf.resolveAlias(alias) === oldRoot)
    // rebuilding onto an occupied destination refuses
    intercept[IllegalArgumentException] {
      IncrementalIvf.rebalance(spark, oldRoot, newRoot)
    }
  }
}
