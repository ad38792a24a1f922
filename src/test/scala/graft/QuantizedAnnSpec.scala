package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Int8 scalar-quantized ANN: codes fit a byte, the quantized ranking
  * is deterministic integer arithmetic, and quantization error costs
  * bounded recall against the exact float path. */
class QuantizedAnnSpec extends GraftSuite {
  import spark.implicits._

  private def emb = spark.read.parquet(s"$sf/embeddings.parquet")
    .select("vec_id", "embedding")

  test("codes are int8-representable and reconstruct within half a scale step") {
    val sq = Similarity.quantizeInt8(emb)
    val bad = sq.select(explode(col("codes")).as("c"))
      .filter(col("c") > 127 || col("c") < -127).count()
    assert(bad === 0, "a code overflowed int8 range")
    // |x - code*scale| <= scale/2 per element (round's error bound)
    val worst = Similarity.quantizeInt8(emb)
      .join(emb, "vec_id")
      .select(expr(
        """aggregate(zip_with(embedding, codes,
          |  (x, c) -> abs(cast(x as double) - c * scale)),
          |  0D, (a, e) -> greatest(a, e)) / nullif(scale, 0D)""".stripMargin)
        .as("worst_steps"))
      .agg(max("worst_steps")).head.getDouble(0)
    assert(worst <= 0.5 + 1e-9, s"reconstruction error $worst steps")
  }

  test("quantized top-k keeps high recall against the exact float ranking") {
    val exact = Similarity.annTopK(emb)
    val quant = Similarity.annTopKQuantized(emb)
    val rec = Similarity.annRecall(exact, quant)
      .agg(avg("recall")).head.getDouble(0)
    // 8-bit codes over 64 dims lose little ranking fidelity; anything
    // below this bound means the quantized scorer is wrong, not lossy
    assert(rec >= 0.8, s"mean recall@10 = $rec")
  }

  test("PQ: every vector gets one code per subspace; codebook vectors encode to themselves") {
    val cb = Similarity.pqCodebook(emb)
    assert(cb.count() === 8 * 16)
    val codes = Similarity.pqCodes(emb, cb)
    val n = emb.count()
    assert(codes.count() === n * 8)
    val bad = codes.filter(col("code") < 0 || col("code") >= 16).count()
    assert(bad === 0)
    // a codebook vector's nearest codeword in every subspace is its own
    val self = codes.filter(col("vec_id") < 16)
      .filter(col("code") =!= col("vec_id")).count()
    assert(self === 0, "codebook vectors must encode to themselves")
  }

  test("PQ top-k recall clears the sanity floor (far above chance)") {
    val exact = Similarity.annTopK(emb)
    val pq = Similarity.annTopKPq(emb)
    assert(pq.groupBy("query_id").count()
      .filter(col("count") =!= 10).count() === 0)
    val rec = Similarity.annRecall(exact, pq)
      .agg(avg("recall")).head.getDouble(0)
    // 8x16 codes over 64 dims is a coarse sketch; chance is k/N = 0.02
    assert(rec >= 0.15, s"mean PQ recall@10 = $rec")
  }

  test("IVF-PQ: results come only from probed lists; ADC matches the PQ scorer") {
    val ivfpq = Similarity.ivfPqTopK(emb).persist()
    // cross-check the composition against its component: within the
    // IVF candidate set, scores must equal the plain PQ scorer's ADC
    // value for the same (query, neighbor) pair — the coarse prune
    // restricts candidates, never changes a surviving score
    val pqAll = Similarity.annTopKPq(emb, k = Int.MaxValue / 2)
    val joined = ivfpq.join(
      pqAll.select(col("query_id"), col("neighbor_id"),
        col("pq_score").as("pq_ref")),
      Seq("query_id", "neighbor_id"), "left")
    assert(joined.filter(col("pq_ref").isNull ||
      col("pq_score") =!= col("pq_ref")).count() === 0,
      "IVF-PQ ADC scores must be the PQ scorer's, restricted")
    // recall floor: coarse-prune + coarse-code, still far above chance
    val rec = Similarity.annRecall(Similarity.annTopK(emb), ivfpq)
      .agg(avg("recall")).head.getDouble(0)
    assert(rec >= 0.1, s"mean IVF-PQ recall@10 = $rec")
    ivfpq.unpersist()
  }

  test("all-zero vectors quantize to zero codes and never rank") {
    val withZero = emb.limit(20).unionByName(
      Seq((9999L, Array.fill(graft.functions.Hashing.EmbDim)(0.0f)))
        .toDF("vec_id", "embedding"))
    val sq = Similarity.quantizeInt8(withZero)
    val z = sq.filter(col("vec_id") === 9999L).head
    assert(z.getAs[Double]("scale") === 0.0)
    assert(z.getAs[Seq[Int]]("codes").forall(_ == 0))
    // the zero vector's score is NULL everywhere -> sinks to the tail,
    // never NaN-pollutes the ranking
    val ranked = Similarity.annTopKQuantized(withZero, nQueries = 5, k = 5)
    assert(ranked.filter(col("neighbor_id") === 9999L &&
      col("qcosine").isNotNull).count() === 0)
  }
}
