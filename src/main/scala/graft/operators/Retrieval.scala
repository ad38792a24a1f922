package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding

/** Corpus retrieval scoring — the TF-IDF / BM25 family a training-data
  * platform uses to rank documents against queries (quality-weighted
  * sampling, targeted corpus slicing, eval-set mining). The reference's
  * pipeline stops at vocabulary statistics (`bronze_to_silver.py`'s
  * token profiling); these are the standard next step over the same
  * tables.
  *
  * Determinism contract (shared with [[TextAnalysis.bigramDocScore]]):
  * no `ln`/`log` anywhere — libm transcendentals are not correctly
  * rounded, so cross-engine bit-equality would be luck. Both scores use
  * the RATIONAL idf forms (`N/df` for TF-IDF, the BM25
  * `(N-df+0.5)/(df+0.5)` ratio without the usual log wrapper): every
  * operation is an IEEE multiply/divide/add with an identical
  * expression tree on the oracle side, then one `roundScaled` at the
  * contract boundary. Rankings are over the ROUNDED score with a full
  * tie-break, so `LIMIT`/`row_number` pick the same rows everywhere.
  */
object Retrieval {

  /** The same whitespace tokenizer every text operator here uses. */
  private def tokens = split(trim(lower(col("text"))), "\\s+")

  /** Per-(doc, term) frequencies — one shuffle on the (doc_id, term)
    * key with map-side partial counts. */
  private def termFreq(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Top-k terms per document by TF-IDF (`tf · N / df`, the log-free
    * rational idf — see the object doc for why).
    *
    * Scale: the tf table is one shuffle; df re-aggregates tf on the
    * term key (a second, vocab-sized shuffle — map-side partials make
    * heavy terms combine early); N is a broadcast 1-row aggregate. The
    * per-doc top-k is a window over the doc_id partition — bounded by
    * doc vocabulary, never a global sort; at 100 TB the tf→df join
    * co-partitions on term and the df side (|vocab| rows) broadcasts
    * under the usual threshold. */
  def tfIdf(docs: DataFrame, k: Int = 5): DataFrame = {
    val tf = termFreq(docs)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    tf.join(df, "term").crossJoin(n)
      .withColumn("tf_idf", Rounding.roundScaled(
        col("tf").cast("double") * col("n_docs").cast("double") /
          col("df").cast("double"), 8))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("tf_idf").desc, col("term"))))
      .filter(col("rnk") <= k)
      .select("doc_id", "term", "tf", "df", "tf_idf", "rnk")
  }

  /** The fixed keyword query [[bm25Search]] scores by default — terms
    * that actually occur in the synthetic corpus vocabulary. */
  val DefaultQuery: Seq[String] = Seq("merge", "spark", "vector", "window")

  /** BM25 keyword search: rank documents against a bag-of-words query,
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))`
    * with the standard k1=1.2, b=0.75 and the RATIONAL idf (no log —
    * object doc). Docs containing none of the query terms score 0 and
    * are omitted. Constants are written as the same decimal literals on
    * both engines (never computed, e.g. k1+1 pre-folded to 2.2) so the
    * parsed doubles agree bit-for-bit.
    *
    * Determinism: the per-doc sum folds contributions in term order
    * (sort_array(collect_list) here, `list(... ORDER BY term)` +
    * list_reduce in the oracle) — a plain SUM over doubles would be
    * partition-order dependent. Final ranking is rounded-score desc,
    * doc_id asc: a total order, so LIMIT k is stable.
    *
    * Scale: tf is the one corpus-sized shuffle; the query-term filter
    * cuts it to |query|·n_docs rows BEFORE any join; df restricted to
    * query terms and the (n_docs, Σdl) stats row are broadcast; the
    * doc-length join co-partitions on doc_id. The final top-k is
    * `TakeOrderedAndProject` — a bounded per-partition heap, never a
    * global sort. */
  def bm25Search(docs: DataFrame, query: Seq[String] = DefaultQuery,
                 k: Int = 20): DataFrame = {
    val qTerms = query.distinct.sorted
    val tf = termFreq(docs)
    val qtf = tf.filter(col("term").isin(qTerms: _*))
    val df = broadcast(qtf.groupBy("term").agg(count(lit(1)).as("df")))
    val dls = docs.select(col("doc_id"), size(tokens).cast("bigint").as("dl"))
    val stats = broadcast(dls.agg(
      count(lit(1)).as("n_docs"), sum("dl").as("sum_dl")))
    val contribs = qtf
      .join(df, "term")
      .join(dls, "doc_id")
      .crossJoin(stats)
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5d)) /
          (col("df").cast("double") + lit(0.5d)))
      .withColumn("contrib",
        col("idf") * (col("tf").cast("double") * lit(2.2d)) /
          (col("tf").cast("double") +
            lit(1.2d) * (lit(0.25d) +
              lit(0.75d) * (col("dl").cast("double") / col("avgdl")))))
    contribs.groupBy("doc_id")
      .agg(max(col("dl")).as("dl"),
        count(lit(1)).as("n_hits"),
        sort_array(collect_list(struct(col("term"), col("contrib"))))
          .as("cs"))
      .select(col("doc_id"), col("dl"), col("n_hits"),
        Rounding.roundScaled(
          expr("aggregate(cs, cast(0 as double), (acc, s) -> acc + s.contrib)"),
          8).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  /** HYBRID SEARCH — Reciprocal Rank Fusion (Cormack et al. 2009) of
    * the lexical [[bm25Search]] leg over `docs` and a dense
    * cosine-similarity leg over `emb` (query = the `queryVec` row's
    * embedding, the query-by-example form): each leg contributes
    * `1/(kRrf + rank)` for the documents in its top-`n`, fused scores
    * rank the final top-`k`. RRF is the standard production fusion for
    * keyword+vector retrieval because it needs NO score calibration —
    * only ranks cross the leg boundary, so a BM25 scale change or an
    * embedding roll never re-weights the fusion.
    *
    * Determinism: ranks are integers from totally-ordered legs (score
    * desc, id asc — both leg scores already replay bit-for-bit in the
    * oracle, see [[bm25Search]] / `ann_topk`), and the fused score is
    * two IEEE divides added in a fixed order (lexical + dense) then
    * [[Rounding.roundScaled]] at the contract boundary. Absent-leg
    * ranks surface as 0 with a 0 contribution.
    *
    * Scale: each leg ends in a `TakeOrderedAndProject` bounded heap
    * (never a global sort) — the lexical leg's cost is [[bm25Search]]'s
    * (query-term-filtered tf), the dense leg is one broadcast-query
    * scan of the embedding table; the fusion then full-outer-joins two
    * ≤`n`-row frames (broadcast, sub-millisecond) so fusion cost is
    * independent of corpus size. The `row_number` windows run over
    * those ≤`n`-row frames, not the corpus. */
  def hybridSearch(docs: DataFrame, emb: DataFrame,
                   query: Seq[String] = DefaultQuery, queryVec: Long = 0L,
                   n: Int = 50, k: Int = 20, kRrf: Int = 60): DataFrame = {
    val lex = bm25Search(docs, query, n)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
          .as("lex_rank"))
    val nrm = Similarity.withNorms(emb)
    val q = nrm.filter(col("vec_id") === queryVec)
      .select(col("embedding").as("q_embedding"), col("nrm").as("q_nrm"))
    val denseTop = nrm.filter(col("vec_id") =!= queryVec)
      .crossJoin(broadcast(q))
      .withColumn("cosine",
        graft.functions.DotProduct.dot(col("embedding"), col("q_embedding")) /
          (col("nrm") * col("q_nrm")))
      .orderBy(col("cosine").desc, col("vec_id")).limit(n)
    val dense = denseTop
      .select(col("vec_id").as("doc_id"),
        row_number().over(Window.orderBy(col("cosine").desc, col("vec_id")))
          .as("dense_rank"))
    def contrib(rank: Column): Column =
      coalesce(lit(1.0d) / (lit(kRrf.toDouble) + rank.cast("double")),
        lit(0.0d))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf", Rounding.roundScaled(
        contrib(col("lex_rank")) + contrib(col("dense_rank")), 8))
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0)).as("dense_rank"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }
}
