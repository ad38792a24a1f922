package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sketches, TextAnalysis}
import graft.sources.Tables

/** Probabilistic sketches: error bounds vs the exact operators. */
class SketchesSpec extends GraftSuite {

  private def docs = Tables.documents(spark, sf)

  test("heavy hitters: CMS estimates bound the exact counts within eps*N") {
    val eps = 0.0001d
    val got = Sketches.tokenHeavyHitters(docs, k = 10, eps = eps).collect()
    assert(got.nonEmpty && got.length <= 10)
    val exact = docs
      .select(explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .groupBy("token").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    got.foreach { r =>
      val (t, est) = (r.getString(0), r.getLong(1))
      val truth = exact(t)
      assert(est >= truth, s"CMS must never underestimate: $t $est < $truth")
      assert(est <= truth + (eps * n).toLong + 1,
        s"CMS overshoot beyond eps*N: $t est=$est truth=$truth n=$n")
    }
    // the KPS candidate pass must surface the true top token
    val topTruth = exact.maxBy { case (t, c) => (c, t) }._1
    assert(got.map(_.getString(0)).contains(topTruth))
    // estimates are reported in descending order
    val ests = got.map(_.getLong(1)).toSeq
    assert(ests === ests.sortBy(-_))
  }

  test("bloom decontaminate: identical answer to the exact operator, probe prunes") {
    val exact = TextAnalysis.decontaminate(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloom = Sketches.bloomDecontaminate(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(bloom === exact) // no false negatives; exact join kills FPs
    assert(bloom.nonEmpty)
    // the probe must actually prune: most corpus shingles are NOT in
    // the eval set, so far fewer than all rows survive at fpp=0.01
    val ratio = Sketches.bloomPruneRatio(spark, docs)
    assert(ratio > 0.0d && ratio < 0.5d, s"prune ratio $ratio")
  }
}
