package graft

import org.apache.spark.sql.functions._

import graft.operators.Unigram

/** Unigram-LM (SentencePiece-style) tokenizer: deterministic Viterbi
  * under the exact-integer lexicographic objective, hard-EM rounds,
  * the single-char coverage floor, and the train → encode chain. */
class UnigramSpec extends GraftSuite {
  import spark.implicits._

  test("segment: fewest pieces wins, then largest weight, then lexicographic") {
    val w = Map("a" -> 5L, "b" -> 5L, "c" -> 5L, "d" -> 5L,
      "ab" -> 9L, "cd" -> 9L, "bc" -> 100L, "abcd" -> 1L)
    // one 4-char piece beats any 2-piece split regardless of weights
    assert(Unigram.segment("abcd", w, 4) === Seq("abcd"))
    // without the 4-gram: 2 pieces beat 3; ab+cd (two pieces) wins
    // over a+bc+d even though bc is the heaviest piece
    assert(Unigram.segment("abcd", w - "abcd", 4) === Seq("ab", "cd"))
    // weight tie-break inside equal piece counts: ab+c (9+5) beats
    // a+bc (5+100)? no — 105 > 14, a+bc wins on weight at equal count
    assert(Unigram.segment("abc", w - "abcd", 4) === Seq("a", "bc"))
    // lexicographic final tie-break: equal count and equal weight
    val tie = Map("x" -> 1L, "y" -> 1L, "xy" -> 2L, "yx" -> 2L)
    // "xyx" as xy+x (2+1) vs x+yx (1+2): equal (2 pieces, weight 3) —
    // the lexicographically earlier sequence wins: ["x","yx"] < ["xy","x"]
    assert(Unigram.segment("xyx", tie, 4) === Seq("x", "yx"))
  }

  test("unsegmentable words refuse loudly (coverage contract)") {
    val e = intercept[IllegalArgumentException] {
      Unigram.segment("axb", Map("a" -> 1L, "b" -> 1L), 4)
    }
    assert(e.getMessage.contains("unsegmentable"))
  }

  test("train keeps every single char (zero-weight allowed), prunes dead multi pieces") {
    // "ab" is so dominant that the singles a/b never appear in any
    // segmentation — they must SURVIVE training anyway (coverage),
    // while multi-char candidates that lose every Viterbi race drop
    val docs = Seq.tabulate(20)(i => (i.toLong, "abab ab abab"))
      .toDF("doc_id", "text")
    val pieces = Unigram.train(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(pieces.contains("a") && pieces.contains("b"))
    assert(pieces.keySet.filter(_.length == 1) === Set("a", "b"))
    // the dominant piece carries the counts
    assert(pieces("ab") > 0L)
    // a piece can only be a word-internal substring of the corpus
    assert(pieces.keySet.forall("abab".contains(_)))
  }

  test("encode: per-doc token counts follow the trained segmentation") {
    val docs = Seq(
      (1L, "alpha beta alpha"),
      (2L, "beta"),
      (3L, "")).toDF("doc_id", "text")
    val weights = Unigram.trainWeights(docs)
    val got = Unigram.encode(docs, weights).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // token counts are per word-occurrence sums; doc 3 has no words
    val perWord = Map(
      "alpha" -> Unigram.segment("alpha", weights.toMap, 4).length.toLong,
      "beta" -> Unigram.segment("beta", weights.toMap, 4).length.toLong)
    assert(got(1L) === 2 * perWord("alpha") + perWord("beta"))
    assert(got(2L) === perWord("beta"))
    assert(!got.contains(3L))
  }

  test("training is deterministic (bit-identical piece tables across runs)") {
    val docs = graft.sources.Tables.documents(spark, sf).limit(200)
    val a = Unigram.train(docs).collect().map(_.toSeq).toSet
    val b = Unigram.train(docs).collect().map(_.toSeq).toSet
    assert(a === b && a.nonEmpty)
  }
}
