package graft.operators

import java.io.ByteArrayInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Probabilistic-sketch operators — the sublinear-memory paths a
  * 100 TB curation pipeline leans on when exact shuffles stop fitting:
  * count-min frequency estimation for heavy hitters and bloom-filter
  * membership for join pruning. Complements the HLL++ distinct counts
  * and GK percentile sketches in [[TextAnalysis]] (`vocabTopKApprox`,
  * `tokenPercentilesApprox`).
  *
  * Neither operator is oracle-hashable by nature (sketch layouts are
  * engine-specific); both are bound-tested against their exact
  * counterparts instead.
  */
object Sketches {

  private def tokens = split(trim(lower(col("text"))), "\\s+")

  /** Heavy-hitter tokens via count-min sketch + streaming candidates —
    * the boilerplate/spam-string detector of a curation pipeline, with
    * NO token-key shuffle at all (compare [[TextAnalysis.vocabTopK]]:
    * a full groupBy over every token occurrence).
    *
    * Two sublinear passes over the exploded tokens:
    *  1. candidates: `stat.freqItems` (Karp-Papadimitriou-Shenker
    *     streaming majority) — bounded 1/support entries per partition,
    *     guaranteed to contain every token with frequency > support·N
    *     (plus possible false positives);
    *  2. counts: ONE mergeable count-min sketch (`count_min_sketch`
    *     aggregate, fixed seed → deterministic layout) estimates each
    *     candidate's count — always an overestimate, within eps·N at
    *     confidence `conf`.
    * The driver handles only the sketch (w·d counters) and the bounded
    * candidate list, never a token table. */
  def tokenHeavyHitters(docs: DataFrame, k: Int = 20,
                        support: Double = 0.001d,
                        eps: Double = 0.0001d, conf: Double = 0.99d,
                        seed: Int = 42): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val tok = docs.select(explode(tokens).as("token"))
    val candidates = tok.stat.freqItems(Seq("token"), support)
      .head().getSeq[String](0).filter(_ != null)
    // count_min_sketch over zero rows aggregates to NULL, not an
    // empty sketch — degenerate corpus → empty report, no NPE
    val bytes = Option(tok
      .agg(expr(s"count_min_sketch(token, ${eps}d, ${conf}d, $seed)"))
      .head().getAs[Array[Byte]](0))
    bytes match {
      case None => Seq.empty[(String, Long)].toDF("token", "est_count")
      case Some(b) =>
        val cms = CountMinSketch.readFrom(new ByteArrayInputStream(b))
        candidates
          .map(t => (t, cms.estimateCount(t)))
          .sortBy { case (t, c) => (-c, t) }
          .take(k)
          .toDF("token", "est_count")
    }
  }

  /** Bloom-pruned benchmark decontamination — result-identical to
    * [[TextAnalysis.decontaminate]] (equivalence-tested), but the
    * corpus side probes an O(bytes) bloom filter BEFORE the exact
    * shingle join: at 100 TB the corpus-side exchange carries only
    * probable matches (fpp of the non-matching volume) instead of
    * every shingle occurrence. No false negatives by construction, and
    * the exact join downstream removes the false positives, so the
    * approximation never changes the answer — it only prunes the
    * shuffle.
    *
    * The filter is built by a distributed mergeable aggregation
    * (`stat.bloomFilter`) sized from the counted eval vocabulary and
    * shipped as ONE broadcast bitset — milli-fractions of the
    * equivalent broadcast hash relation. */
  def bloomDecontaminate(docs: DataFrame, evalSource: String = "src0",
                         fpp: Double = 0.01d): DataFrame = {
    val spark = docs.sparkSession
    val inv = Dedup.shingled(docs)
      .select(col("doc_id"), col("source"), explode(col("shingles")).as("sh"))
    val evalShingles = inv.filter(col("source") === evalSource)
      .select("sh").distinct().persist()
    // stat.bloomFilter NPEs on a zero-row build side — an empty eval
    // set shares nothing, so the probe degenerates to "keep nothing"
    val n = evalShingles.count()
    val corpus = inv.filter(col("source") =!= evalSource)
    val pruned =
      if (n == 0L) corpus.limit(0)
      else {
        val bf = evalShingles.stat.bloomFilter("sh", n, fpp)
        graft.functions.BloomContains.register(spark)
        // codegen'd native probe over the serialized sketch — the
        // sublinear pre-prune, no FN; stays in whole-stage codegen
        corpus.filter(graft.functions.BloomContains.contains(
          lit(graft.functions.BloomContains.serialize(bf)), col("sh")))
      }
    pruned
      .join(broadcast(evalShingles), "sh") // exact verify: FPs drop here
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  /** The pruning ratio [[bloomDecontaminate]]'s bloom probe achieves on
    * a corpus: (rows surviving the probe) / (total corpus shingle
    * rows). Diagnostic for sizing fpp at scale. */
  def bloomPruneRatio(spark: SparkSession, docs: DataFrame,
                      evalSource: String = "src0",
                      fpp: Double = 0.01d): Double = {
    val inv = Dedup.shingled(docs)
      .select(col("source"), explode(col("shingles")).as("sh"))
    val evalShingles = inv.filter(col("source") === evalSource)
      .select("sh").distinct()
    val n = evalShingles.count()
    if (n == 0L) return 0.0d
    val bf = evalShingles.stat.bloomFilter("sh", n, fpp)
    graft.functions.BloomContains.register(spark)
    val probe = graft.functions.BloomContains.contains(
      lit(graft.functions.BloomContains.serialize(bf)), col("sh"))
    val corpus = inv.filter(col("source") =!= evalSource).persist()
    val total = corpus.count().max(1L)
    val kept = corpus.filter(probe).count()
    corpus.unpersist()
    kept.toDouble / total.toDouble
  }
}
