package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chunk-level (substring) deduplication — the curation step AFTER
  * doc-level dedup: repeated PASSAGES across otherwise-distinct
  * documents (license headers, boilerplate navigation, quoted
  * templates) are found at sliding-window granularity and reported as
  * per-doc token REMOVAL SPANS. Composes the existing pieces:
  * [[TextAnalysis.docChunks]] splits docs into overlapping windows,
  * [[spans]] is the CCNet-style exact paragraph-hash pass (gate key
  * `chunk_dedup`), and [[dedupBatch]] runs chunk-level MinHash against
  * a persisted [[IncrementalDedup]] store so an arriving batch dedups
  * its passages against every passage ever ingested at O(batch) cost.
  *
  * A chunk occurrence is addressed as `doc_id * ChunkIdSpace +
  * chunk_idx` (one long key — lets the chunk table ride every doc-id
  * keyed operator unchanged); the earliest occurrence in that ordering
  * is the canonical copy, every other occurrence is a removal span.
  */
object ChunkDedup {

  /** Max chunks per doc in the packed chunk key: supports ~240M-token
    * documents at the default stride before two chunks of one doc
    * could collide. */
  val ChunkIdSpace = 10000000L

  /** Exact repeated-passage spans: hash every chunk window, group by
    * hash (ONE chunk-hash shuffle with map-side partials), keep every
    * occurrence that is not its group's earliest — emitted with its
    * token span `[span_start, span_end)` and the canonical occurrence
    * it duplicates. Scale: the chunk table is ~tokens/stride rows,
    * shuffle-free to build; the hash rollup and the co-partitioned
    * join back are the only exchanges. */
  def spans(docs: DataFrame, chunkSize: Int = 32,
            stride: Int = 24): DataFrame = {
    val ch = TextAnalysis.docChunks(docs, chunkSize, stride)
      .withColumn("chunk_hash", md5(col("chunk_text").cast("binary")))
    val grp = ch.groupBy("chunk_hash").agg(
      min(col("doc_id") * ChunkIdSpace + col("chunk_idx")).as("canon_key"),
      count(lit(1)).as("n_occurrences"))
    ch.join(grp, Seq("chunk_hash"))
      .filter(col("doc_id") * ChunkIdSpace + col("chunk_idx") =!=
        col("canon_key"))
      .select(
        col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("span_start"),
        (col("chunk_idx") * stride + col("n_tokens")).as("span_end"),
        expr(s"canon_key div $ChunkIdSpace").as("canonical_doc"),
        pmod(col("canon_key"), lit(ChunkIdSpace)).as("canonical_chunk"),
        col("n_occurrences"))
  }

  /** Chunk-level NEAR-dup dedup against a persisted cross-batch store —
    * [[IncrementalDedup.dedupBatch]] applied to the chunk table: each
    * batch's passages MinHash-match the canonical passages of every
    * earlier batch (band join against the store, corpus never
    * rescanned), new canonical passages append atomically, and a
    * replayed batch matches itself and adds nothing. Returns one row
    * per batch chunk: the removal span, the canonical (doc, chunk) it
    * duplicates, `is_dup`, and `matched_store` (the match crossed
    * batches). Chunks too short to shingle pass through as their own
    * canonicals (same rule as the doc-level path). */
  def dedupBatch(spark: SparkSession, storeRoot: String, docs: DataFrame,
                 chunkSize: Int = 32, stride: Int = 24,
                 threshold: Double = 0.8): DataFrame = {
    val ch = TextAnalysis.docChunks(docs, chunkSize, stride)
    val batch = ch.select(
      (col("doc_id") * ChunkIdSpace + col("chunk_idx")).as("doc_id"),
      col("chunk_text").as("text"))
    val verdicts = IncrementalDedup.dedupBatch(spark, storeRoot, batch,
      threshold)
      .select(
        expr(s"doc_id div $ChunkIdSpace").as("doc_id"),
        pmod(col("doc_id"), lit(ChunkIdSpace)).as("chunk_idx"),
        expr(s"canonical_id div $ChunkIdSpace").as("canonical_doc"),
        pmod(col("canonical_id"), lit(ChunkIdSpace)).as("canonical_chunk"),
        col("is_dup"), col("matched_store"))
    // span bounds re-join on the chunk table's own (doc, idx) key
    verdicts.join(ch.select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("span_start"),
        (col("chunk_idx") * stride + col("n_tokens")).as("span_end")),
      Seq("doc_id", "chunk_idx"))
      .select("doc_id", "chunk_idx", "span_start", "span_end",
        "canonical_doc", "canonical_chunk", "is_dup", "matched_store")
  }
}
