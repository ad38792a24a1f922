package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{ChunkDedup, SnapshotTable}

/** Chunk-level dedup: exact repeated-passage spans + the
  * batch-over-store MinHash path (IncrementalDedup applied to the
  * chunk table). */
class ChunkDedupSpec extends GraftSuite {
  import spark.implicits._

  // a 36-token "license header" long enough to fill a full 32-token
  // chunk window identically wherever it leads a document
  private val license = (1 to 36).map(i => s"license$i").mkString(" ")
  private def fresh(tag: String, n: Int) =
    (1 to n).map(i => s"${tag}word$i").mkString(" ")

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("spans: repeated passages across docs resolve to the earliest occurrence") {
    val d = docs(
      1L -> (license + " " + fresh("a", 60)),
      2L -> (license + " " + fresh("b", 60)),
      3L -> fresh("c", 90))
    val rows = ChunkDedup.spans(d).collect()
    // doc 2's chunk 0 is the 32-token license window doc 1 also opens
    // with; doc 3 shares nothing
    val flagged = rows.map(r => (r.getAs[Long]("doc_id"),
      r.getAs[Long]("chunk_idx"))).toSet
    assert(flagged.contains((2L, 0L)))
    assert(!rows.exists(_.getAs[Long]("doc_id") == 3L))
    val r2 = rows.find(r => r.getAs[Long]("doc_id") == 2L &&
      r.getAs[Long]("chunk_idx") == 0L).get
    assert(r2.getAs[Long]("canonical_doc") === 1L)
    assert(r2.getAs[Long]("canonical_chunk") === 0L)
    assert(r2.getAs[Long]("span_start") === 0L)
    assert(r2.getAs[Long]("span_end") === 32L)
    assert(r2.getAs[Long]("n_occurrences") === 2L)
  }

  test("batch-over-store: a later batch's passages match the stored canonicals") {
    val store = Files.createTempDirectory("graft-chunk-store").toString
    val v1 = ChunkDedup.dedupBatch(spark, store,
      docs(1L -> (license + " " + fresh("a", 60))))
    // batch 1 seeds the store: its own chunks are canonical
    assert(v1.filter(col("is_dup")).count() === 0)
    val stored1 = SnapshotTable.read(spark, store).count()
    assert(stored1 > 0)

    // batch 2: a NEW doc opening with the same license — its opening
    // chunk must match the STORE (batch 1's text is never re-read)
    val v2 = ChunkDedup.dedupBatch(spark, store,
      docs(7L -> (license + " " + fresh("z", 60))))
    val hit = v2.filter(col("doc_id") === 7L && col("chunk_idx") === 0L)
      .head()
    assert(hit.getAs[Boolean]("is_dup"))
    assert(hit.getAs[Boolean]("matched_store"))
    assert(hit.getAs[Long]("canonical_doc") === 1L)
    assert(hit.getAs[Long]("canonical_chunk") === 0L)
    assert(hit.getAs[Long]("span_start") === 0L && hit.getAs[Long]("span_end") === 32L)
    // doc 7's fresh tail chunks are new canonicals
    assert(v2.filter(!col("is_dup")).count() > 0)

    // replay of batch 2: verdicts keep their canonicals, store grows by
    // nothing (the replay matches itself)
    val n2 = SnapshotTable.read(spark, store).count()
    val v2r = ChunkDedup.dedupBatch(spark, store,
      docs(7L -> (license + " " + fresh("z", 60))))
    assert(SnapshotTable.read(spark, store).count() === n2)
    val rhit = v2r.filter(col("doc_id") === 7L && col("chunk_idx") === 0L).head()
    assert(rhit.getAs[Long]("canonical_doc") === 1L)
    assert(rhit.getAs[Boolean]("is_dup"))
  }

  test("spans agree with an independently recomputed hash grouping") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text")
    val got = ChunkDedup.spans(d)
      .select("doc_id", "chunk_idx", "canonical_doc", "canonical_chunk")
      .collect().map(_.toSeq).toSet
    // naive recomputation off the chunk table itself
    val ch = graft.operators.TextAnalysis.docChunks(d)
      .withColumn("h", md5(col("chunk_text").cast("binary")))
      .select("doc_id", "chunk_idx", "h")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val byHash = ch.groupBy(_._3)
    val expect = byHash.values.flatMap { occ =>
      val sorted = occ.toSeq.sortBy(o => o._1 * ChunkDedup.ChunkIdSpace + o._2)
      val canon = sorted.head
      sorted.tail.map(o => Seq(o._1, o._2, canon._1, canon._2))
    }.toSet
    assert(got === expect)
    assert(got.nonEmpty) // the synthetic corpus carries repeated passages
  }
}
