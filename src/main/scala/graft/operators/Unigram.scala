package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Unigram-LM (SentencePiece-style) tokenizer TRAINING and encoding
  * (Kudo 2018) — the second of the two tokenizer families real
  * pipelines train ([[Bpe]] covers merge-based): a piece VOCABULARY
  * with corpus-estimated weights, segmentation by per-word Viterbi
  * over that vocabulary, and hard-EM re-estimation rounds (segment →
  * recount → re-weight), with single characters never pruned (the
  * SentencePiece coverage rule — every word stays segmentable).
  *
  * Determinism (the repo's libm-free stance, [[TextAnalysis.bigramLm]]
  * / [[Bpe]]): log-likelihood Viterbi would compare IEEE `ln` sums
  * whose last ulp differs across engines, so segmentation optimizes
  * the exact-integer lexicographic objective
  *
  *   (fewest pieces, then largest Σ piece-weight, then
  *    lexicographically earliest piece sequence)
  *
  * — fewest-pieces-most-frequent is the unigram-likelihood shape
  * (fewer factors, each as large as possible), and every comparison
  * is integer/binary-string exact, so the DuckDB oracle replays the
  * whole train → encode chain bit-for-bit (its DP folds the same
  * struct ordering through `list_sort`). Fixed training rounds; piece
  * candidates are all substrings up to `maxPieceLen`, the top
  * `vocabMulti` multi-char pieces by (weight DESC, piece ASC) plus
  * every single character.
  *
  * Scale shape: like [[Bpe]], training runs over the DEDUPLICATED
  * word inventory, never the corpus — candidate generation is one
  * explode+groupBy shuffle, each EM round segments the ‖vocab‖-sized
  * word table SHUFFLE-FREE (a broadcast piece map + a per-row DP)
  * and recounts with one groupBy, and encoding joins the corpus
  * token stream against the word-level segmentation (broadcast when
  * small). The piece table itself is tokenizer-sized (driver-held),
  * exactly like [[Bpe]]'s merge list. */
object Unigram {

  /** Compare piece sequences the way DuckDB compares VARCHAR[] —
    * element-wise binary, shorter prefix first. Corpus pieces here
    * are lowercased text; for ASCII this equals Java's compareTo
    * (non-ASCII corpora would need UTF-8-byte comparison, the
    * [[SnapshotTable.statValueOrdering]] caveat). */
  private def seqLt(a: IndexedSeq[String], b: IndexedSeq[String]): Boolean = {
    var i = 0
    while (i < a.length && i < b.length) {
      val c = a(i).compareTo(b(i))
      if (c != 0) return c < 0
      i += 1
    }
    a.length < b.length
  }

  /** The deterministic Viterbi segmentation of one word over a piece
    * weight map: minimize piece count, then maximize total weight,
    * then lexicographically earliest sequence. Every position is
    * reachable because the vocabulary always contains every single
    * character of the corpus. */
  private[graft] def segment(word: String, weights: Map[String, Long],
                             maxPieceLen: Int): IndexedSeq[String] = {
    val n = word.length
    // best(i) = (pieces, totalWeight, sequence) for the length-i prefix
    val best = new Array[(Int, Long, Vector[String])](n + 1)
    best(0) = (0, 0L, Vector.empty)
    var i = 1
    while (i <= n) {
      var cur: (Int, Long, Vector[String]) = null
      var l = 1
      val lMax = math.min(maxPieceLen, i)
      while (l <= lMax) {
        val piece = word.substring(i - l, i)
        weights.get(piece) match {
          case Some(w) if best(i - l) != null =>
            val (k0, s0, q0) = best(i - l)
            val cand = (k0 + 1, s0 + w, q0 :+ piece)
            val betterThan = cur == null ||
              cand._1 < cur._1 ||
              (cand._1 == cur._1 && (cand._2 > cur._2 ||
                (cand._2 == cur._2 && seqLt(cand._3, cur._3))))
            if (betterThan) cur = cand
          case _ => ()
        }
        l += 1
      }
      best(i) = cur
      i += 1
    }
    require(best(n) != null,
      s"unsegmentable word '$word' — a character is missing from the " +
        "vocabulary (single characters must never be pruned)")
    best(n)._3
  }

  /** Candidate piece weights over the (already persisted) word-count
    * inventory: every substring of length 1..maxPieceLen of every
    * distinct word, weighted by corpus word count × in-word
    * occurrences (overlaps counted). One explode + one shuffle — the
    * corpus-sized tokenize behind `words` is paid once by the caller,
    * shared with the EM rounds. */
  private def candidateWeights(words: DataFrame,
                               maxPieceLen: Int): DataFrame =
    words
      .select(col("cnt"), explode(expr(
        s"""flatten(transform(sequence(1, $maxPieceLen), l ->
           |  if(length(word) >= l,
           |    transform(sequence(1, length(word) - l + 1),
           |      i -> substring(word, i, l)),
           |    cast(array() as array<string>))))""".stripMargin))
        .as("piece"))
      .groupBy("piece").agg(sum("cnt").as("c"))

  /** Train the unigram piece table: `rounds` hard-EM iterations over
    * the word inventory. Returns the final (piece, weight) map —
    * multi-char pieces whose round count hit zero are pruned, single
    * characters always survive (weight 0 allowed). */
  def trainWeights(docs: DataFrame, vocabMulti: Int = 96,
                   maxPieceLen: Int = 4, rounds: Int = 2)
      : Seq[(String, Long)] = {
    require(vocabMulti >= 0 && maxPieceLen >= 1 && rounds >= 1,
      "need vocabMulti >= 0, maxPieceLen >= 1, rounds >= 1")
    val spark = docs.sparkSession
    // ONE corpus tokenize: the persisted word inventory feeds both the
    // candidate generation and every EM round
    val words = Bpe.wordCounts(docs).persist()
    val cand = candidateWeights(words, maxPieceLen).persist()
    val multi = cand.filter(length(col("piece")) > 1)
      .orderBy(col("c").desc, col("piece"))
      .limit(vocabMulti).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val singles = cand.filter(length(col("piece")) === 1).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    cand.unpersist()
    var voc: Map[String, Long] = (multi ++ singles).toMap
    try {
      for (_ <- 1 to rounds) {
        val counts = segmentedPieceCounts(spark, words, voc, maxPieceLen)
        // prune zero-count multi pieces; singles stay for coverage
        voc = voc.keysIterator.flatMap { p =>
          val c = counts.getOrElse(p, 0L)
          if (c > 0L || p.length == 1) Some(p -> c) else None
        }.toMap
      }
    } finally words.unpersist()
    voc.toSeq.sortBy(_._1)
  }

  /** One E-step recount: segment the distinct-word inventory under
    * `voc` (broadcast map, shuffle-free per-row DP) and roll piece
    * occurrences weighted by word counts — one groupBy. The result
    * is tokenizer-sized, collected to the driver like [[Bpe]]'s
    * per-iteration argmax. */
  private def segmentedPieceCounts(spark: SparkSession, words: DataFrame,
                                   voc: Map[String, Long],
                                   maxPieceLen: Int): Map[String, Long] = {
    val vocB = spark.sparkContext.broadcast(voc)
    val segUdf = udf { (w: String) =>
      segment(w, vocB.value, maxPieceLen)
    }
    words.select(col("cnt"), explode(segUdf(col("word"))).as("piece"))
      .groupBy("piece").agg(sum("cnt").as("c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  /** The trained piece TABLE (piece, n_piece) — the tokenizer
    * artifact a deployment persists (weight 0 single chars included:
    * they are part of the vocabulary's coverage floor). */
  def train(docs: DataFrame, vocabMulti: Int = 96, maxPieceLen: Int = 4,
            rounds: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainWeights(docs, vocabMulti, maxPieceLen, rounds)
      .toDF("piece", "n_piece")
  }

  /** Per-document token counts under a trained weight table: the
    * corpus token stream joined to the ‖vocab‖-sized word
    * segmentation (broadcast when small) — [[Bpe.encode]]'s shape. */
  def encode(docs: DataFrame, weights: Seq[(String, Long)],
             maxPieceLen: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    val vocB = spark.sparkContext.broadcast(weights.toMap)
    val nSegUdf = udf { (w: String) =>
      segment(w, vocB.value, maxPieceLen).length.toLong
    }
    val enc = Bpe.wordCounts(docs).select(col("word"))
      .withColumn("n_syms", nSegUdf(col("word")))
    docs.select(col("doc_id"),
        explode(split(trim(lower(col("text"))), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .join(enc, "word")
      .groupBy("doc_id")
      .agg(sum("n_syms").as("unigram_tokens"))
  }
}
