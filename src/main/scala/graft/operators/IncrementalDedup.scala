package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Incremental corpus deduplication against a persisted MinHash
  * signature store — the production shape of dedup at 100 TB: a new
  * batch is deduplicated against everything ever ingested WITHOUT
  * rescanning the corpus. Cost per batch is O(batch + matched
  * buckets), not O(corpus) — the same "run cost tracks the batch, not
  * the table" property the incremental pipeline gives the marts.
  *
  * The store (a [[SnapshotTable]], so appends are atomic,
  * time-travelable, and compactable) holds ONE row per canonical doc:
  * `(doc_id, mh)` — exactly the [[Dedup.signatures]] table, bucketed
  * by `sig_bucket = doc_id % 16` for partition-pruned maintenance.
  * Dups' signatures are NOT stored (matching any canonical is enough;
  * a dup's near-dups are near-dups of its canonical at these
  * thresholds).
  *
  * Candidate generation is the same 32×4 LSH band join as
  * [[Dedup.minhashLsh]]; verification uses the UNBIASED MinHash
  * estimate of Jaccard (the fraction of agreeing signature
  * components) because the store keeps signatures only — storing
  * shingle sets for exact verification would re-create a second copy
  * of the corpus, which is precisely what an incremental store
  * exists to avoid. With 128 permutations the estimate's σ ≈ 0.035
  * at J=0.8, the standard accuracy/space trade of signature-only
  * dedup (documented, test-pinned against the exact path on
  * clear-cut duplicates).
  *
  * Batch-internal dups resolve by the same min-label connected
  * components as the batch operators ([[Dedup.clusters]]); a batch
  * cluster that touches the store adopts the OLDEST matched store
  * canonical (min doc_id — deterministic under any partitioning).
  * Replay-safe: a batch whose docs are already stored matches itself
  * identically (estimate = 1) and adds nothing — `canonical_id` and
  * `is_dup` come back unchanged (`matched_store` reads true on the
  * replay, reflecting that the store now knows the doc), so an
  * at-least-once pipeline can re-run a crashed batch.
  */
object IncrementalDedup {

  private val Buckets = 16

  /** MinHash Jaccard estimate between two signature array columns
    * (named `a`/`b`): the fraction of the 128 components that agree.
    * Integer sum, one IEEE division — deterministic everywhere. */
  private def estJaccard(a: String, b: String): Column =
    expr(s"aggregate(zip_with($a, $b, " +
      "(x, y) -> if(x = y, 1, 0)), 0, (acc, v) -> acc + v)")
      .cast("double") / lit(Hashing.NumPerms.toDouble)

  /** Read the canonical-signature store (empty frame if none yet). */
  def readStore(spark: SparkSession, storeRoot: String): DataFrame =
    if (SnapshotTable.latestVersion(storeRoot) >= 0)
      SnapshotTable.read(spark, storeRoot).select("doc_id", "mh")
    else {
      import spark.implicits._
      Seq.empty[(Long, Array[Long])].toDF("doc_id", "mh")
    }

  /** Deduplicate `batch` against the store AND itself, then append the
    * new canonicals' signatures to the store as one atomic snapshot
    * commit. Returns one verdict row per batch doc:
    * `(doc_id, canonical_id, is_dup, matched_store)` where
    * `canonical_id` is the doc itself, its batch-cluster minimum, or
    * the oldest matched store canonical; `matched_store` says the
    * match crossed batches. Docs too short to shingle (< 3 tokens)
    * pass through as their own canonicals and are not stored (same
    * rule as [[Dedup.minhashLsh]], which cannot pair them either).
    *
    * Scale: signatures are one shuffle-free kernel pass over the
    * batch; the band join touches only buckets the batch's bands hash
    * into (at warehouse scale the store's band table is a persisted
    * derived table bucketed on (band, sig) — the join prunes to the
    * batch's buckets, never a store scan); CC runs over batch-internal
    * pairs only. The store append is a fast-append snapshot commit —
    * O(new canonicals). */
  def dedupBatch(spark: SparkSession, storeRoot: String, batch: DataFrame,
                 threshold: Double = 0.8): DataFrame = {
    val (verdicts, newCanonicals, caches) =
      planCached(batch, readStore(spark, storeRoot), threshold)
    if (!newCanonicals.isEmpty)
      SnapshotTable.commitAppend(newCanonicals, storeRoot, "sig_bucket")
    // fully materialize the caller-owned verdicts cache, then release
    // the internal signature/store caches a long-lived driver would
    // otherwise accumulate across batches
    verdicts.count()
    caches.filterNot(_ eq verdicts).foreach(_.unpersist())
    verdicts
  }

  /** The storage-free planning half of [[dedupBatch]]: given the
    * current store CONTENT (`(doc_id, mh)`), returns the per-doc
    * verdicts and the new canonicals' signature rows (with their
    * `sig_bucket`) ready to append. Callers that govern the store as a
    * catalog table ([[CurationRun]]) stage the append themselves and
    * publish it atomically with the rest of the batch.
    *
    * The returned frames pin internal persisted intermediates; callers
    * ingesting many batches should use [[planCached]] and unpersist the
    * returned caches once both outputs are consumed. */
  def plan(batch: DataFrame, storeContent: DataFrame,
           threshold: Double = 0.8): (DataFrame, DataFrame) = {
    val (v, n, _) = planCached(batch, storeContent, threshold)
    (v, n)
  }

  /** [[plan]] plus the internal persisted frames (signatures, store,
    * verdicts) so eager runners can unpersist them after the commit
    * that consumes the outputs. */
  private[graft] def planCached(batch: DataFrame, storeContent: DataFrame,
      threshold: Double = 0.8): (DataFrame, DataFrame, Seq[DataFrame]) = {
    val shl = Dedup.shingled(batch).select("doc_id", "shingles")
      .filter(size(col("shingles")) > 0)
    // persisted: feeds the band join (twice via self-join) + the append
    val sigs = Dedup.signatures(shl).persist()
    val store = storeContent.persist()
    val batchBands = Dedup.bandsOf(sigs)
    val storeBands = Dedup.bandsOf(store)

    // batch-vs-store candidates → estimate-verified matches
    val storeMatches = batchBands.as("a")
      .join(storeBands.as("b"), Seq("band", "sig"))
      .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("store_doc"))
      .dropDuplicates("doc_id", "store_doc")
      .join(sigs.select(col("doc_id"), col("mh").as("mh_a")), "doc_id")
      .join(store.select(col("doc_id").as("store_doc"), col("mh").as("mh_b")),
        "store_doc")
      .filter(estJaccard("mh_a", "mh_b") >= threshold)
      .select("doc_id", "store_doc")

    // batch-internal near-dup pairs (same band join + estimate verify)
    val internalPairs = batchBands.as("a")
      .join(batchBands.as("b"), Seq("band", "sig"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .join(sigs.select(col("doc_id").as("doc_a"), col("mh").as("mh_a")), "doc_a")
      .join(sigs.select(col("doc_id").as("doc_b"), col("mh").as("mh_b")), "doc_b")
      .filter(estJaccard("mh_a", "mh_b") >= threshold)
      .select("doc_a", "doc_b")

    // min-label CC over the internal pairs; unpaired docs are singletons
    val clustered = Dedup.clusters(internalPairs)
      .select(col("doc_id"), col("cluster_id"))
    val labeled = batch.select("doc_id")
      .join(clustered, Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))

    // a cluster adopts the OLDEST store canonical any member matched
    val clusterStore = labeled.join(storeMatches, Seq("doc_id"))
      .groupBy("cluster_id").agg(min("store_doc").as("store_canonical"))
    val verdicts = labeled
      .join(clusterStore, Seq("cluster_id"), "left")
      .select(col("doc_id"),
        coalesce(col("store_canonical"), col("cluster_id"))
          .as("canonical_id"),
        col("store_canonical").isNotNull.as("matched_store"))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
      .select("doc_id", "canonical_id", "is_dup", "matched_store")
      .persist()

    // append ONLY genuinely-new canonicals' signatures (replay lands
    // here empty: every doc then matches the store, incl. itself)
    val newCanonicals = verdicts
      .filter(!col("is_dup") && !col("matched_store"))
      .select("doc_id")
      .join(sigs, "doc_id") // short docs have no signature → not stored
      .join(store.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("sig_bucket", pmod(col("doc_id"), lit(Buckets)))
    (verdicts, newCanonicals, Seq(sigs, store, verdicts))
  }
}
