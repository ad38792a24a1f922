package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, SnapshotTable}

/** The liveDocs side of the stored inverted index: upsert-survivable
  * delta maintenance (tombstones instead of full rebuilds), slop
  * phrase search, and batched multi-query serving. */
class RetrievalLiveDocsSpec extends GraftSuite {

  private def docs = {
    import spark.implicits._
    Seq(
      (1L, "spark spark spark merge", "en", "src0", 23L),
      (2L, "vector window merge join join join", "en", "src0", 34L),
      (3L, "the the the the the the the the", "en", "src1", 31L),
      (4L, "spark vector window merge", "en", "src1", 25L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def newRoot(tag: String): String =
    java.nio.file.Files.createTempDirectory(tag).toString + "/t"

  private def stored(root: String, v: Long = -1L) =
    Retrieval.bm25SearchStored(spark, root, version = v)
      .collect().map(_.toSeq).toSeq

  private def scan(d: org.apache.spark.sql.DataFrame) =
    Retrieval.bm25Search(d).collect().map(_.toSeq).toSeq

  test("upsertMor maintenance takes the tombstone path — zero full rebuilds") {
    val root = newRoot("graft-bm25-upsert")
    val d = docs
    SnapshotTable.commitAppend(d.filter(col("doc_id") <= 2L),
      root, "source") // v0
    Retrieval.indexCorpus(spark, root)
    SnapshotTable.commitAppend(d.filter(col("doc_id") > 2L),
      root, "source") // v1 (range-disjoint fast path)
    assert(Retrieval.indexCorpusDelta(spark, root) === 1L)
    val fb = Retrieval.fullBuilds.get
    // MERGE-upsert: doc 2 replaced with new text + fresh doc 7, one
    // commit (appended rows + doc_id equality-delete sidecar)
    val batch = d.filter(col("doc_id") === 2L)
      .withColumn("text", lit("merge merge window fresh"))
      .unionByName(d.filter(col("doc_id") === 4L)
        .withColumn("doc_id", lit(7L))
        .withColumn("text", lit("spark window group")))
    SnapshotTable.upsertMor(spark, root, "source", batch,
      Seq("doc_id")) // v2
    assert(Retrieval.indexCorpusDelta(spark, root) === 2L)
    assert(Retrieval.fullBuilds.get === fb,
      "upsert maintenance silently fell back to a full rebuild")
    // coverage: full + two delta segments, one tombstone delta
    assert(Retrieval.indexSegments(root).size === 3)
    assert(Retrieval.indexSegments(root).exists(_.contains("seg-2")))
    assert(Retrieval.indexTombs(root) === Seq("v=2/_bm25/tomb-2"))
    // answers ≡ the scan path over the post-upsert corpus (old doc 2
    // dead, new doc 2 + doc 7 live; df/n_docs/Σdl all re-balanced)
    val expect = d.filter(col("doc_id") =!= 2L).unionByName(batch)
    assert(stored(root) === scan(expect))
    // the phrase path honors the same tombstones
    assert(Retrieval.phraseSearch(spark, root, Seq("merge", "merge"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq ===
      Retrieval.phraseScan(expect, Seq("merge", "merge"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq)
    // time travel: v1's coverage still answers under ITS corpus
    assert(stored(root, v = 1L) === scan(d))
  }

  test("pure equality-delete maintenance tombstones without a new segment") {
    val root = newRoot("graft-bm25-eqdel")
    SnapshotTable.commitAppend(docs, root, "source") // v0
    Retrieval.indexCorpus(spark, root)
    val fb = Retrieval.fullBuilds.get
    import spark.implicits._
    SnapshotTable.deleteEqualityMor(spark, root,
      Seq(1L, 3L).toDF("doc_id")) // v1
    assert(Retrieval.indexCorpusDelta(spark, root) === 1L)
    assert(Retrieval.fullBuilds.get === fb)
    assert(Retrieval.indexSegments(root).size === 1, "no rows appended")
    assert(Retrieval.indexTombs(root).nonEmpty)
    assert(stored(root) ===
      scan(docs.filter(!col("doc_id").isin(1L, 3L))))
    // an eq-delete of a key that never existed is a no-op, not a
    // phantom tombstone
    SnapshotTable.deleteEqualityMor(spark, root,
      Seq(99L).toDF("doc_id")) // v2
    assert(Retrieval.indexCorpusDelta(spark, root) === 2L)
    assert(Retrieval.indexTombs(root).size === 1, "phantom tombstone")
    assert(stored(root) ===
      scan(docs.filter(!col("doc_id").isin(1L, 3L))))
  }

  test("a re-inserted id survives its dead ancestor's tombstone (per-segment liveDocs)") {
    val root = newRoot("graft-bm25-reinsert")
    val d = docs
    SnapshotTable.commitAppend(d, root, "source") // v0
    Retrieval.indexCorpus(spark, root)
    import spark.implicits._
    SnapshotTable.deleteEqualityMor(spark, root,
      Seq(2L).toDF("doc_id")) // v1: doc 2 dies
    Retrieval.indexCorpusDelta(spark, root)
    // doc 2 comes BACK with different text in a later append — its
    // tombstone is keyed to the OLD segment, so the new copy must live
    val reborn = d.filter(col("doc_id") === 2L)
      .withColumn("text", lit("vector vector merge"))
    SnapshotTable.upsertMor(spark, root, "source", reborn,
      Seq("doc_id")) // v2
    val fb = Retrieval.fullBuilds.get
    assert(Retrieval.indexCorpusDelta(spark, root) === 2L)
    assert(Retrieval.fullBuilds.get === fb)
    assert(stored(root) ===
      scan(d.filter(col("doc_id") =!= 2L).unionByName(reborn)))
  }

  test("chained upserts accumulate tombstone deltas; compaction purges them") {
    val root = newRoot("graft-bm25-chain")
    val d = docs
    SnapshotTable.commitAppend(d, root, "source") // v0
    Retrieval.indexCorpus(spark, root)
    def upsert(id: Long, text: String): Unit = {
      SnapshotTable.upsertMor(spark, root, "source",
        d.filter(col("doc_id") === 1L)
          .withColumn("doc_id", lit(id)).withColumn("text", lit(text)),
        Seq("doc_id"))
      Retrieval.indexCorpusDelta(spark, root)
    }
    upsert(1L, "merge window one")  // v1
    upsert(4L, "spark merge four")  // v2
    val expect = d.filter(!col("doc_id").isin(1L, 4L))
      .unionByName(d.filter(col("doc_id") === 1L)
        .withColumn("text", lit("merge window one")))
      .unionByName(d.filter(col("doc_id") === 1L)
        .withColumn("doc_id", lit(4L))
        .withColumn("text", lit("spark merge four")))
    assert(Retrieval.indexTombs(root).size === 2)
    val pre = stored(root)
    assert(pre === scan(expect))
    // compaction folds segments AND purges tombstones, bit-identically
    assert(Retrieval.compactIndex(spark, root) === 1)
    assert(Retrieval.indexTombs(root).isEmpty)
    assert(Retrieval.indexSegments(root).size === 1)
    assert(stored(root) === pre)
    // a later upsert chains onto the compacted coverage (the merged
    // segment's doclens sidecar prices the next tombstone set)
    val fb = Retrieval.fullBuilds.get
    upsert(4L, "window group four") // v3
    assert(Retrieval.fullBuilds.get === fb)
    assert(stored(root) === scan(
      expect.filter(col("doc_id") =!= 4L)
        .unionByName(d.filter(col("doc_id") === 1L)
          .withColumn("doc_id", lit(4L))
          .withColumn("text", lit("window group four")))))
  }

  test("refusals fall back to a FULL rebuild, never a wrong answer") {
    import spark.implicits._
    // (a) eq-delete keyed on something other than doc_id
    val rootA = newRoot("graft-bm25-refA")
    SnapshotTable.commitAppend(docs, rootA, "source")
    Retrieval.indexCorpus(spark, rootA)
    SnapshotTable.deleteEqualityMor(spark, rootA,
      Seq("src1").toDF("source"))
    val fbA = Retrieval.fullBuilds.get
    Retrieval.indexCorpusDelta(spark, rootA)
    assert(Retrieval.fullBuilds.get === fbA + 1)
    assert(stored(rootA) === scan(docs.filter(col("source") =!= "src1")))
    // (b) a NEW position delete since the covered ancestor
    val rootB = newRoot("graft-bm25-refB")
    SnapshotTable.commitAppend(docs, rootB, "source")
    Retrieval.indexCorpus(spark, rootB)
    SnapshotTable.deleteWhereMor(spark, rootB, col("doc_id") === 3L)
    val fbB = Retrieval.fullBuilds.get
    Retrieval.indexCorpusDelta(spark, rootB)
    assert(Retrieval.fullBuilds.get === fbB + 1)
    assert(stored(rootB) === scan(docs.filter(col("doc_id") =!= 3L)))
    // (c) an upsert batch carrying a DUPLICATE id cannot delta-index
    // (two copies would land in one segment and double-count df)
    val rootC = newRoot("graft-bm25-refC")
    SnapshotTable.commitAppend(docs, rootC, "source")
    Retrieval.indexCorpus(spark, rootC)
    val dup = docs.filter(col("doc_id") === 2L)
      .withColumn("doc_id", lit(8L))
      .unionByName(docs.filter(col("doc_id") === 4L)
        .withColumn("doc_id", lit(8L)))
    SnapshotTable.upsertMor(spark, rootC, "source", dup, Seq("doc_id"))
    val fbC = Retrieval.fullBuilds.get
    Retrieval.indexCorpusDelta(spark, rootC)
    assert(Retrieval.fullBuilds.get === fbC + 1)
    assert(stored(rootC) === scan(SnapshotTable.read(spark, rootC)))
  }

  test("phraseSearch slop generalizes adjacency; index ≡ scan for every slop") {
    import spark.implicits._
    val pd = Seq(
      (1L, "merge group x"),           // adjacent
      (2L, "merge x group"),           // gap 1
      (3L, "merge x x x group"),       // gap 3
      (4L, "group x merge"),           // reversed — never matches
      (5L, "merge x group x group")    // 2nd end only within slop 3
    ).toDF("doc_id", "text")
    val root = newRoot("graft-phrase-slop")
    SnapshotTable.commit(pd, root)
    Retrieval.indexCorpus(spark, root)
    def hits(slop: Int) =
      Retrieval.phraseSearch(spark, root, Seq("merge", "group"),
        slop = slop)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq
    assert(hits(0) === Seq(1L -> 1))
    assert(hits(1) === Seq(1L -> 1, 2L -> 1, 5L -> 1))
    assert(hits(3) === Seq(1L -> 1, 2L -> 1, 3L -> 1, 5L -> 2))
    // scan-path equivalence at every slop (the oracle's anchor)
    (0 to 3).foreach { s =>
      assert(hits(s) === Retrieval.phraseScan(pd, Seq("merge", "group"),
        slop = s).collect().map(r => r.getLong(0) -> r.getInt(1)).toSeq,
        s"slop $s")
    }
    // three-term chains bound EACH consecutive gap, not the total span
    val pd3 = Seq((9L, "a x b x c"), (10L, "a b x x c"))
      .toDF("doc_id", "text")
    val root3 = newRoot("graft-phrase-slop3")
    SnapshotTable.commit(pd3, root3)
    Retrieval.indexCorpus(spark, root3)
    assert(Retrieval.phraseSearch(spark, root3, Seq("a", "b", "c"),
      slop = 1).collect().map(_.getLong(0)).toSeq === Seq(9L))
    assert(Retrieval.phraseSearch(spark, root3, Seq("a", "b", "c"),
      slop = 2).collect().map(_.getLong(0)).toSeq === Seq(9L, 10L))
    // a term ending in a backslash survives the scan-path literal
    val pdEsc = Seq((11L, "a\\ b")).toDF("doc_id", "text")
    assert(Retrieval.phraseScan(pdEsc, Seq("a\\", "b"))
      .collect().map(_.getLong(0)).toSeq === Seq(11L))
  }

  test("bm25SearchStoredBatch ≡ per-query stored answers, one job shape") {
    val root = newRoot("graft-bm25-batch")
    SnapshotTable.commitAppend(docs, root, "source")
    Retrieval.indexCorpus(spark, root)
    val qs = Seq(
      "qa" -> Seq("merge", "spark"),
      "qb" -> Seq("window", "the"),
      "qc" -> Seq("zzz_absent"))
    val batch = Retrieval.bm25SearchStoredBatch(spark, root, qs, k = 3)
      .collect()
    assert(batch.map(_.getString(0)).distinct.sorted === Array("qa", "qb"))
    qs.foreach { case (qid, terms) =>
      val single = Retrieval.bm25SearchStored(spark, root, terms, k = 3)
        .collect().map(_.toSeq).toSeq
      val slice = batch.filter(_.getString(0) == qid)
        .map(_.toSeq.tail).toSeq
      assert(slice === single, s"query $qid diverged from the single path")
    }
    // uncovered version: the per-query scan fallback is answer-identical
    val root2 = newRoot("graft-bm25-batch-fb")
    SnapshotTable.commit(docs, root2)
    val fb = Retrieval.bm25SearchStoredBatch(spark, root2, qs, k = 3)
      .collect().map(_.toSeq).toSeq
    assert(fb === batch.map(_.toSeq).toSeq)
    // tombstones apply to the batched path too
    val batch2 = docs.filter(col("doc_id") === 4L)
      .withColumn("text", lit("the the merge"))
    SnapshotTable.upsertMor(spark, root, "source", batch2, Seq("doc_id"))
    Retrieval.indexCorpusDelta(spark, root)
    val expect = docs.filter(col("doc_id") =!= 4L).unionByName(batch2)
    qs.foreach { case (qid, terms) =>
      val viaBatch = Retrieval.bm25SearchStoredBatch(spark, root, qs, k = 3)
        .filter(col("query_id") === qid)
        .collect().map(_.toSeq.tail).toSeq
      assert(viaBatch === Retrieval.bm25Search(expect, terms, k = 3)
        .collect().map(_.toSeq).toSeq, s"post-upsert $qid")
    }
  }
}
