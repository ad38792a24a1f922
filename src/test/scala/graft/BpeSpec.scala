package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** BPE training: greedy leftmost merge passes, deterministic
  * (count DESC, left, right) merge selection, early stop, and
  * corpus encoding under the learned merges — pinned on a
  * hand-derivable fixture. */
class BpeSpec extends GraftSuite {
  import spark.implicits._

  test("merge ranks and counts match the hand-derived fixture, with early stop") {
    // vocab: abab ×2, abc ×1
    val docs = Seq((1L, "abab abc"), (2L, "abab")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, 10)
    // pairs: (a,b)=5, (b,a)=2, (b,c)=1 -> merge1 (a,b)
    // then abab=[ab,ab], abc=[ab,c]: (ab,ab)=2, (ab,c)=1 -> merge2
    // then abab=[abab], abc=[ab,c]: (ab,c)=1 -> merge3; nothing left
    assert(merges === Seq(("a", "b", 5L), ("ab", "ab", 2L),
      ("ab", "c", 1L)))
  }

  test("a run merges leftmost-first (the BPE greedy rule)") {
    val docs = Seq((1L, "aaa")).toDF("doc_id", "text")
    val enc = Bpe.encodeVocab(docs, Seq(("a", "a")))
      .select("syms").as[Seq[String]].head
    assert(enc === Seq("aa", "a"))
  }

  test("tie-breaks select the lexicographically smallest pair") {
    // (a,b) and (c,d) both occur once -> (a,b) wins rank 1
    val docs = Seq((1L, "ab cd")).toDF("doc_id", "text")
    val merges = Bpe.trainMerges(docs, 2)
    assert(merges.map(m => (m._1, m._2)) === Seq(("a", "b"), ("c", "d")))
  }

  test("encode counts BPE tokens per doc under the trained merges") {
    val docs = Seq((1L, "abab abc abab"), (2L, "abc"), (3L, "zq"))
      .toDF("doc_id", "text")
    val merges = Seq(("a", "b"), ("ab", "ab"))
    val got = Bpe.encode(docs, merges)
      .as[(Long, Long)].collect().toMap
    // abab -> [abab] = 1; abc -> [ab, c] = 2; zq -> [z, q] = 2
    assert(got === Map(1L -> 4L, 2L -> 2L, 3L -> 2L))
  }

  test("training on the documents corpus yields monotone-nonincreasing pair counts") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val merges = Bpe.trainMerges(docs, 6)
    assert(merges.size === 6)
    val counts = merges.map(_._3)
    assert(counts === counts.sorted.reverse,
      s"greedy argmax must be non-increasing: $counts")
    // merged symbols are concatenations of their parents
    merges.foreach { case (l, r, _) =>
      assert((l + r).nonEmpty && l.nonEmpty && r.nonEmpty)
    }
  }
}
