package graft

import org.apache.spark.sql.functions._

import graft.functions.DotProduct
import graft.operators.Similarity
import graft.sources.Tables

/** SemDeDup invariants over the real embeddings table: every vector is
  * verdicted exactly once, and the keep/drop rule is exactly "dropped
  * iff a lower-id cluster-mate sits at/above the cosine threshold"
  * (checked against an independent brute-force within-cluster pass). */
class SemanticDedupSpec extends GraftSuite {

  test("verdicts are total and match the brute-force within-cluster rule") {
    val emb = Tables.embeddings(spark, sf)
    val out = Similarity.semanticDedup(emb, threshold = 0.4).persist()

    assert(out.count() === emb.count())
    assert(out.select("vec_id").distinct().count() === emb.count())

    // independent rule check: recompute within-cluster pairs brute-force
    val n = Similarity.withNorms(emb)
    val asg = out.select(col("vec_id"), col("cluster_id"))
      .join(n, "vec_id")
    val a = asg.select(col("cluster_id"), col("vec_id").as("va"),
      col("embedding").as("ea"), col("nrm").as("na"))
    val b = asg.select(col("cluster_id"), col("vec_id").as("vb"),
      col("embedding").as("eb"), col("nrm").as("nb"))
    val shouldDrop = a.join(b, "cluster_id")
      .filter(col("va") < col("vb"))
      .filter(DotProduct.dot(col("ea"), col("eb")) /
        (col("na") * col("nb")) >= 0.4)
      .select(col("vb").as("vec_id")).distinct()
    val expectDropped = shouldDrop.collect().map(_.getLong(0)).toSet
    val gotDropped = out.filter(!col("keep"))
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(gotDropped === expectDropped)
    assert(gotDropped.nonEmpty, "threshold 0.4 should drop something here")
    // the lowest id of every cluster can never be dropped
    val clusterMins = out.groupBy("cluster_id").agg(min("vec_id").as("m"))
      .select("m").collect().map(_.getLong(0)).toSet
    assert(clusterMins.intersect(gotDropped).isEmpty)
    out.unpersist()
  }
}
