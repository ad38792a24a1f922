package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE tokenizer TRAINING and encoding (Sennrich et al. 2016) — the
  * canonical "train the tokenizer on the corpus" step of an LLM data
  * pipeline ([[TextAnalysis.bigramLm]] surfaces merge-pair candidates;
  * this is the real iterative trainer).
  *
  * Scale shape: training runs over the DEDUPLICATED word inventory
  * (‖vocab‖ rows with corpus counts — never the corpus itself), the
  * classic trick that makes BPE training tractable: each of the k
  * iterations is one pair-count shuffle over the vocab plus a 1-row
  * driver argmax, and the symbol arrays advance through a
  * lineage-truncated fold. Encoding joins the corpus token stream
  * against the ‖vocab‖-sized encoded table — one shuffle, and the
  * encoded vocab broadcasts when small.
  *
  * Determinism: merge selection ties break on (count DESC, left,
  * right) lexicographically; the merge pass is the greedy
  * leftmost-first fold, so the whole train→encode chain is
  * reproducible bit-for-bit on any engine (the DuckDB oracle replays
  * the identical iterations). Word-internal merges only — no
  * end-of-word marker, so merges never span words (documented
  * simplification; add a marker symbol per word to lift it). */
object Bpe {

  /** Distinct words with corpus counts — the training inventory
    * (empty tokens dropped; whitespace tokenizer shared with
    * [[TextAnalysis]]). */
  def wordCounts(docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(lower(col("text"))), "\\s+"))
        .as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** One greedy leftmost-first merge pass of the pair (x, y) over a
    * symbol-array column: adjacent (x, y) becomes the single symbol
    * x+y, scanning left to right (a run `x x x` with pair (x,x)
    * merges to `xx x`, the BPE rule). */
  private[graft] def mergePass(symsCol: String, x: String,
                               y: String): Column = {
    val (lx, ly, lxy) = (sqlLit(x), sqlLit(y), sqlLit(x + y))
    val in = s"`$symsCol`"
    expr(s"""aggregate($in, cast(array() as array<string>),
      |  (acc, t) -> if(size(acc) > 0 AND element_at(acc, -1) = $lx
      |      AND t = $ly,
      |    concat(slice(acc, 1, size(acc) - 1), array($lxy)),
      |    concat(acc, array(t))))""".stripMargin)
  }

  /** The learned merges, driver-side: (left, right, pair count) in
    * rank order. Stops early when no adjacent pair remains. */
  def trainMerges(docs: DataFrame, numMerges: Int)
      : Seq[(String, String, Long)] = {
    var cur = wordCounts(docs)
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
      .localCheckpoint()
    val merges = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 1 to numMerges if !done) {
      val best = cur
        .select(col("cnt"), explode(expr(
          """zip_with(slice(syms, 1, size(syms) - 1),
            |  slice(syms, 2, size(syms) - 1),
            |  (a, b) -> named_struct('l', a, 'r', b))""".stripMargin))
          .as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("cnt").as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1).collect()
      if (best.isEmpty) done = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1),
          best(0).getLong(2))
        merges += ((l, r, c))
        cur = cur.withColumn("syms", mergePass("syms", l, r))
          .localCheckpoint()
      }
    }
    merges.result()
  }

  /** Train and return the merge TABLE (rank, lft, rgt, pair_count) —
    * the tokenizer artifact a deployment persists. */
  def train(docs: DataFrame, numMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, numMerges).zipWithIndex
      .map { case ((l, r, c), i) => (i + 1, l, r, c) }
      .toDF("rank", "lft", "rgt", "pair_count")
  }

  /** Encode the word inventory under a trained merge list: (word,
    * syms) with merges applied in rank order — the ‖vocab‖-sized
    * table corpus encoding joins against. */
  def encodeVocab(docs: DataFrame,
                  merges: Seq[(String, String)]): DataFrame = {
    val base = wordCounts(docs).select(col("word"))
      .withColumn("syms", expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"))
    merges.foldLeft(base) { case (df, (l, r)) =>
      df.withColumn("syms", mergePass("syms", l, r))
    }
  }

  /** Per-document BPE token counts under a trained merge list: the
    * corpus token stream joined to the encoded vocab (one doc_id
    * rollup; the vocab side broadcasts when small). */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    val enc = encodeVocab(docs, merges)
      .select(col("word"), size(col("syms")).cast("long").as("n_syms"))
    docs.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(enc, "word")
      .groupBy("doc_id")
      .agg(sum("n_syms").as("bpe_tokens"))
  }
}
