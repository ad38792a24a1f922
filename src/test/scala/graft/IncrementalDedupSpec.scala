package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IncrementalDedup, SnapshotTable}

/** Batch-over-store dedup: cost tracks the batch, verdicts track the
  * corpus. */
class IncrementalDedupSpec extends GraftSuite {
  import spark.implicits._

  // long bases so a one-word edit keeps exact shingle-Jaccard ≈ 0.9:
  // the 128-perm estimate and the 32x4 banding then sit far from the
  // 0.8 threshold on BOTH sides (fixed perms → fully deterministic)
  private val base =
    ("the quick brown fox jumps over the lazy dog while the festival " +
      "crowd gathers near the old stone bridge to watch boats drift " +
      "slowly beneath the autumn lanterns before the evening market opens")
  private val other =
    ("an entirely different report describing broadcast hash joins " +
      "shuffle partitions catalyst rules tungsten codegen and adaptive " +
      "execution stages measured across many terabytes of parquet scans")
  private def near(s: String) = s + " extra"

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  test("cross-batch dups resolve against the store, not the old batch") {
    val root = Files.createTempDirectory("graft-incdedup").toString
    val b1 = docs(
      1L -> base,
      2L -> near(base), // near-dup of 1 within the batch
      3L -> other)
    val v1 = IncrementalDedup.dedupBatch(spark, root, b1).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3))))
      .toMap
    assert(v1(1L) === ((1L, false, false)))
    assert(v1(2L) === ((1L, true, false))) // batch-internal dup
    assert(v1(3L) === ((3L, false, false)))
    // store holds canonicals only: docs 1 and 3
    assert(IncrementalDedup.readStore(spark, root)
      .select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))

    val b2 = docs(
      10L -> base, // dup of STORED canonical 1 — batch 1 is gone
      11L -> ("fresh coverage of vector search inverted file indexes " +
        "coarse quantizers probe lists recall curves and the brute " +
        "force baseline every approximate method is judged against"),
      12L -> near("fresh coverage of vector search inverted file indexes " +
        "coarse quantizers probe lists recall curves and the brute " +
        "force baseline every approximate method is judged against"))
    val v2 = IncrementalDedup.dedupBatch(spark, root, b2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2), r.getBoolean(3))))
      .toMap
    assert(v2(10L) === ((1L, true, true))) // matched the store
    assert(v2(11L) === ((11L, false, false)))
    assert(v2(12L) === ((11L, true, false)))
    // store grew by the ONE new canonical
    assert(IncrementalDedup.readStore(spark, root)
      .select("doc_id").as[Long].collect().sorted.toSeq === Seq(1L, 3L, 11L))
  }

  test("replay of a committed batch adds nothing and keeps verdicts") {
    val root = Files.createTempDirectory("graft-incdedup-replay").toString
    val b = docs(1L -> base, 2L -> near(base))
    IncrementalDedup.dedupBatch(spark, root, b)
    val storeV = SnapshotTable.latestVersion(root)
    val replay = IncrementalDedup.dedupBatch(spark, root, b).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    // same canonical/is_dup; no new snapshot version (nothing appended)
    assert(replay(1L) === ((1L, false)))
    assert(replay(2L) === ((1L, true)))
    assert(SnapshotTable.latestVersion(root) === storeV)
  }

  test("incremental canonicals agree with the one-shot batch path") {
    val root = Files.createTempDirectory("graft-incdedup-equiv").toString
    val all = Seq(
      1L -> base, 2L -> near(base),
      3L -> other,
      4L -> near(other),
      5L -> ("a third standalone essay on watermark semantics state " +
        "stores session windows exactly once sinks and checkpoint " +
        "recovery paths in long running structured streaming jobs"))
    // two arrival batches, doc_id order
    IncrementalDedup.dedupBatch(spark, root, docs(all.take(2): _*))
    val v2 = IncrementalDedup.dedupBatch(spark, root, docs(all.drop(2): _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // one-shot: full minhash + CC over the union
    val full = docs(all: _*)
    val oneShot = Dedup.clusters(Dedup.minhashLsh(full))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(v2(3L) === oneShot.getOrElse(3L, 3L))
    assert(v2(4L) === oneShot.getOrElse(4L, 4L))
    assert(v2(5L) === oneShot.getOrElse(5L, 5L))
    // and batch-1 canonicals persisted for the cross-batch answer
    assert(IncrementalDedup.readStore(spark, root)
      .select("doc_id").as[Long].collect().toSet === Set(1L, 3L, 5L))
  }

  test("short docs pass through unstored; empty batch is a no-op") {
    val root = Files.createTempDirectory("graft-incdedup-short").toString
    val v = IncrementalDedup.dedupBatch(spark, root,
      docs(1L -> "too short", 2L -> base)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(v(1L) === ((1L, false))) // own canonical, but no signature
    assert(IncrementalDedup.readStore(spark, root)
      .select("doc_id").as[Long].collect().toSeq === Seq(2L))
    val empty = IncrementalDedup.dedupBatch(spark, root,
      docs())
    assert(empty.count() === 0)
    assert(IncrementalDedup.readStore(spark, root).count() === 1)
  }
}
