package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Catalog, CurationRun, IncrementalDedup}

/** Governed curation: batches stage, gate, publish atomically; the
  * dedup store is versioned WITH the corpus. */
class CurationRunSpec extends GraftSuite {
  import spark.implicits._

  // all words unique so the Gopher top-word filter passes (a repeated
  // "the" at 6/33 would exceed the 10% repetition bound by design)
  private val base =
    ("quick brown foxes jump over lazy dogs while festival crowds " +
      "gather near old stone bridges to watch boats drift slowly " +
      "beneath autumn lanterns before evening markets open")
  private val other =
    ("entirely different reports describing broadcast hash joins " +
      "shuffle partitions catalyst rules tungsten codegen and adaptive " +
      "execution stages measured across many terabytes of parquet scans")

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("batches publish atomically; cross-batch dups resolve via the governed store") {
    val cat = Files.createTempDirectory("graft-curation").toString
    val c1 = CurationRun.runBatch(spark, cat,
      docs(1L -> base, 2L -> (base + " extra"), 3L -> other), 0L)
    assert(c1 >= 0)
    val corpus1 = Catalog.read(spark, cat, "corpus")
    assert(corpus1.count() === 3)
    assert(CurationRun.keptCorpus(spark, cat).count() === 2) // doc 2 is a dup
    assert(Catalog.read(spark, cat, "dedup_signatures").count() === 2)

    // batch 2: doc 10 duplicates STORED canonical 1 — flagged via the
    // catalog's signature table, batch 1's text is never re-read
    val c2 = CurationRun.runBatch(spark, cat,
      docs(10L -> base,
        11L -> ("fresh coverage of vector search inverted file indexes " +
          "coarse quantizers probe lists recall curves plus brute " +
          "force baselines every approximate method gets judged against")),
      1L)
    assert(c2 > c1)
    val corpus = Catalog.read(spark, cat, "corpus")
    assert(corpus.count() === 5)
    val v10 = corpus.filter(col("doc_id") === 10L).head()
    assert(v10.getAs[Long]("canonical_id") === 1L)
    assert(v10.getAs[Boolean]("is_dup") && !v10.getAs[Boolean]("keep"))
    assert(Catalog.read(spark, cat, "dedup_signatures").count() === 3)

    // replay of batch 1 is an exactly-once no-op
    assert(CurationRun.runBatch(spark, cat,
      docs(10L -> base), 1L) === c2)
    assert(Catalog.read(spark, cat, "corpus").count() === 5)
  }

  test("retraction erases corpus rows AND signatures atomically; near-dups re-admit") {
    val cat = Files.createTempDirectory("graft-curation-retract").toString
    CurationRun.runBatch(spark, cat,
      docs(1L -> base, 3L -> other), 0L)
    assert(CurationRun.keptCorpus(spark, cat).count() === 2)
    val cBefore = Catalog.latestCommit(cat)

    // one catalog commit moves BOTH tables (merge-on-read: no
    // partition rewrites — read counts drop, history resurrects)
    val cRet = CurationRun.retract(spark, cat, Seq(1L))
    assert(cRet === cBefore + 1)
    assert(CurationRun.keptCorpus(spark, cat)
      .select("doc_id").as[Long].collect().toSet === Set(3L))
    assert(Catalog.read(spark, cat, "dedup_signatures")
      .filter(col("doc_id") === 1L).count() === 0)

    // a near-duplicate of the retracted doc must be ADMITTED now —
    // nothing of the erased text may keep acting as a dedup anchor
    val c2 = CurationRun.runBatch(spark, cat, docs(20L -> base), 1L)
    assert(c2 > cRet)
    val v20 = Catalog.read(spark, cat, "corpus")
      .filter(col("doc_id") === 20L).head()
    assert(v20.getAs[Boolean]("keep") && !v20.getAs[Boolean]("is_dup"))

    // governance still holds: rollback to before the retraction
    // resurrects the erased doc and its signature together
    Catalog.rollback(cat, cBefore)
    assert(CurationRun.keptCorpus(spark, cat)
      .filter(col("doc_id") === 1L).count() === 1)
    assert(Catalog.read(spark, cat, "dedup_signatures")
      .filter(col("doc_id") === 1L).count() === 1)

    // retracting an id that matches nothing is a commit-free no-op
    assert(CurationRun.retract(spark, cat, Seq(999L)) ===
      Catalog.latestCommit(cat))
  }

  test("an empty batch publishes an empty slice without NPE-ing the gate") {
    val cat = Files.createTempDirectory("graft-curation-empty").toString
    CurationRun.runBatch(spark, cat, docs(1L -> base, 2L -> other), 0L)
    // zero rows staged: SUM(keep) aggregates to NULL — the gate must
    // treat that as 0 kept of 0, not throw
    val c = CurationRun.runBatch(spark, cat, docs(), 1L)
    assert(c >= 0)
    assert(Catalog.read(spark, cat, "corpus").count() === 2)
  }

  test("a poisoned batch aborts before publication — corpus AND store untouched") {
    val cat = Files.createTempDirectory("graft-curation-gate").toString
    CurationRun.runBatch(spark, cat, docs(1L -> base), 0L)
    val commit = Catalog.latestCommit(cat)
    // every doc fails quality (too short) → keep rate 0
    intercept[IllegalStateException] {
      CurationRun.runBatch(spark, cat,
        docs(20L -> "junk", 21L -> "x", 22L -> "y z"), 1L)
    }
    assert(Catalog.latestCommit(cat) === commit)
    assert(Catalog.read(spark, cat, "corpus").count() === 1)
    assert(Catalog.read(spark, cat, "dedup_signatures").count() === 1)
    // the failed batch id is NOT recorded — a fixed batch can re-run
    assert(!CurationRun.committedBatchIds(cat).contains(1L))
  }

  test("rollback rewinds corpus and dedup store together; re-ingest re-deduplicates") {
    val cat = Files.createTempDirectory("graft-curation-rb").toString
    val c1 = CurationRun.runBatch(spark, cat, docs(1L -> base), 0L)
    CurationRun.runBatch(spark, cat, docs(5L -> other), 1L)
    Catalog.rollback(cat, c1)
    assert(Catalog.read(spark, cat, "corpus").count() === 1)
    assert(Catalog.read(spark, cat, "dedup_signatures").count() === 1)
    assert(!CurationRun.committedBatchIds(cat).contains(1L))
    // re-ingesting the rolled-back batch dedups against the REWOUND
    // store — verdicts identical to the first ingestion
    CurationRun.runBatch(spark, cat, docs(5L -> other), 1L)
    assert(Catalog.read(spark, cat, "corpus").count() === 2)
    assert(Catalog.read(spark, cat, "dedup_signatures").count() === 2)
    assert(CurationRun.keptCorpus(spark, cat).count() === 2)
  }

  // a 12-token passage lifted verbatim from `base` — long enough for
  // three 10-token substring windows, far too little shared vocabulary
  // for a MinHash whole-doc verdict at 0.8
  private val passage = base.split(" ").take(12).mkString(" ")
  private def freshDoc(tag: String, n: Int) =
    (1 to n).map(i => s"${tag}tok$i").mkString(" ")

  test("substring store publishes atomically with the corpus") {
    val cat = Files.createTempDirectory("graft-curation-ss").toString
    val c0 = CurationRun.runBatch(spark, cat,
      docs(1L -> base, 3L -> other), 0L, substringWindow = Some(10))
    val seedCanon = Catalog.read(spark, cat, "substring_store").count()
    assert(seedCanon > 0L) // batch 1 seeded canonicals for both docs
    // batch 2: doc 10 is mostly FRESH text carrying the 12-token
    // passage at offset 8 — not a MinHash dup, but its passage windows
    // hit the governed store
    val c1 = CurationRun.runBatch(spark, cat,
      docs(10L -> (freshDoc("f", 8) + " " + passage + " " +
        freshDoc("g", 12))), 1L, substringWindow = Some(10))
    assert(c1 === c0 + 1) // ONE commit moved corpus AND store
    val v10 = Catalog.read(spark, cat, "corpus")
      .filter(col("doc_id") === 10L).head()
    assert(!v10.getAs[Boolean]("is_dup")) // MinHash says fresh
    assert(v10.getAs[Long]("substr_removed") === 12L) // span [8, 20)
    assert(v10.getAs[Boolean]("keep"))
    // doc 10's fresh windows became canonicals in the same commit
    assert(Catalog.read(spark, cat, "substring_store").count() > seedCanon)
    // clean docs carry substr_removed = 0, not null
    assert(Catalog.read(spark, cat, "corpus")
      .filter(col("doc_id") === 3L).head()
      .getAs[Long]("substr_removed") === 0L)
  }

  test("a gate abort leaves corpus AND substring store untouched") {
    val cat = Files.createTempDirectory("graft-curation-ssgate").toString
    CurationRun.runBatch(spark, cat, docs(1L -> base), 0L,
      substringWindow = Some(10))
    val commit = Catalog.latestCommit(cat)
    val canon = Catalog.read(spark, cat, "substring_store").count()
    // every doc fails repetition (one word repeated 15×) — and being
    // self-repetitive, each STAGES substring-store appends that the
    // abort must discard
    intercept[IllegalStateException] {
      CurationRun.runBatch(spark, cat,
        docs(20L -> ("dup " * 15).trim, 21L -> ("bad " * 15).trim),
        1L, substringWindow = Some(10))
    }
    assert(Catalog.latestCommit(cat) === commit)
    assert(Catalog.read(spark, cat, "substring_store").count() === canon)
    assert(!CurationRun.committedBatchIds(cat).contains(1L))
  }

  test("rollback rewinds substring store with the corpus; re-ingest agrees") {
    val cat = Files.createTempDirectory("graft-curation-ssrb").toString
    val c0 = CurationRun.runBatch(spark, cat, docs(1L -> base), 0L,
      substringWindow = Some(10))
    val canon0 = Catalog.read(spark, cat, "substring_store").count()
    val b1 = docs(10L -> (freshDoc("f", 8) + " " + passage + " " +
      freshDoc("g", 12)))
    CurationRun.runBatch(spark, cat, b1, 1L, substringWindow = Some(10))
    assert(Catalog.read(spark, cat, "substring_store").count() > canon0)
    Catalog.rollback(cat, c0)
    // both tables rewound together — no path-owned split brain
    assert(Catalog.read(spark, cat, "substring_store").count() === canon0)
    assert(Catalog.read(spark, cat, "corpus").count() === 1)
    // re-ingestion sees the rewound store: identical verdict
    CurationRun.runBatch(spark, cat, b1, 1L, substringWindow = Some(10))
    assert(Catalog.read(spark, cat, "corpus")
      .filter(col("doc_id") === 10L).head()
      .getAs[Long]("substr_removed") === 12L)
  }

  test("runFull bootstraps through the full governed surface: corpus + signatures + substring store, rollback rewinds all three") {
    val cat = Files.createTempDirectory("graft-curation-full").toString
    // doc_id % 4 batches: 4 → batch 0 (seeds canonicals), 1 → batch 1
    // (fresh text carrying batch 0's passage — a CROSS-BATCH substring
    // hit through the governed store), 6 → batch 2, batch 3 empty
    val d = docs(
      4L -> base,
      1L -> (freshDoc("f", 8) + " " + passage + " " + freshDoc("g", 12)),
      6L -> other)
    val last = CurationRun.runFull(spark, d, cat, batches = 4,
      substringWindow = Some(10))
    // one atomic commit per batch carried all three tables
    val vs = Catalog.tableVersions(cat)
    assert(vs.contains("corpus") && vs.contains("dedup_signatures") &&
      vs.contains("substring_store"), vs)
    assert(Catalog.read(spark, cat, "corpus").count() === 3)
    // the cross-batch substring hit resolved through the STORE — batch
    // 0's text was never re-read
    assert(Catalog.read(spark, cat, "corpus")
      .filter(col("doc_id") === 1L).head()
      .getAs[Long]("substr_removed") === 12L)
    // resume semantics: a re-run replays every published batch as an
    // exactly-once skip (empty batches publish nothing to begin with)
    assert(CurationRun.runFull(spark, d, cat, batches = 4,
      substringWindow = Some(10)) === last)
    // rollback to the bootstrap's first commit rewinds ALL THREE
    val first = 0L
    val canonAll = Catalog.read(spark, cat, "substring_store").count()
    Catalog.rollback(cat, first)
    assert(Catalog.read(spark, cat, "corpus").count() === 1) // batch 0
    assert(Catalog.read(spark, cat, "dedup_signatures").count() === 1)
    assert(Catalog.read(spark, cat, "substring_store").count() < canonAll)
    // and the rewound bootstrap RESUMES: batches 1/2 re-ingest with
    // identical verdicts against the rewound store
    CurationRun.runFull(spark, d, cat, batches = 4,
      substringWindow = Some(10))
    assert(Catalog.read(spark, cat, "corpus").count() === 3)
    assert(Catalog.read(spark, cat, "corpus")
      .filter(col("doc_id") === 1L).head()
      .getAs[Long]("substr_removed") === 12L)
  }

  test("retraction drops substring canonicals — passages re-admit") {
    val cat = Files.createTempDirectory("graft-curation-ssret").toString
    CurationRun.runBatch(spark, cat, docs(1L -> base, 3L -> other), 0L,
      substringWindow = Some(10))
    val canonBefore = Catalog.read(spark, cat, "substring_store").count()
    CurationRun.retract(spark, cat, Seq(1L))
    // doc 1's canonicals died in the SAME commit as its corpus row
    val store = Catalog.read(spark, cat, "substring_store")
    assert(store.count() < canonBefore)
    assert(store.filter(
      expr(s"canon_key div ${graft.operators.ChunkDedup.ChunkIdSpace}")
        === 1L).count() === 0L)
    // a later batch carrying the retracted doc's passage is ADMITTED —
    // nothing of the erased text still acts as a dedup anchor
    CurationRun.runBatch(spark, cat,
      docs(30L -> (freshDoc("h", 8) + " " + passage + " " +
        freshDoc("k", 12))), 1L, substringWindow = Some(10))
    val v30 = Catalog.read(spark, cat, "corpus")
      .filter(col("doc_id") === 30L).head()
    assert(v30.getAs[Long]("substr_removed") === 0L)
    assert(v30.getAs[Boolean]("keep"))
  }

  test("dedupBatch facade still owns its own store") {
    // the refactor split plan() out of dedupBatch — its behavior is
    // unchanged (regression for the storage-owning path)
    val root = Files.createTempDirectory("graft-curation-facade").toString
    val v = IncrementalDedup.dedupBatch(spark, root,
      docs(1L -> base, 2L -> (base + " extra"))).collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(v === Map(1L -> false, 2L -> true))
  }
}
