package graft

import org.apache.spark.sql.functions._

import graft.operators.{ChunkDedup, Dedup}
import graft.sources.Tables

/** Token-granularity exact-substring dedup (Lee et al. 2022
  * ExactSubstr): stride-1 window hashing catches duplicated passages
  * at ANY offset — including ones that straddle or shift across the
  * aligned chunk boundaries [[ChunkDedup]] hashes. */
class SubstringDedupSpec extends GraftSuite {
  import spark.implicits._

  private def fresh(tag: String, n: Int) =
    (1 to n).map(i => s"${tag}word$i").mkString(" ")

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // a 25-token passage: one window (20) long enough to flag, short
  // enough to hide inside a 32-token chunk at a shifted offset
  private val passage = (1 to 25).map(i => s"passage$i").mkString(" ")

  test("a shared passage is flagged in every non-canonical occurrence") {
    val d = docs(
      1L -> (passage + " " + fresh("a", 40)),
      2L -> (fresh("b", 10) + " " + passage + " " + fresh("c", 30)),
      3L -> fresh("d", 60))
    val rows = Dedup.exactSubstring(d).collect()
    // doc 1 holds the earliest occurrence (canonical — not flagged);
    // doc 2's copy starts at token 10; doc 3 shares nothing
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === Set(2L))
    val r = rows.head
    // windows 10..15 (each 20 tokens, last ends at 15+20=35) all
    // duplicate → one merged span [10, 35) covering the passage
    assert(r.getAs[Long]("span_start") === 10L)
    assert(r.getAs[Long]("span_end") === 35L)
    assert(r.getAs[Long]("n_windows") === 6L)
  }

  test("catches a boundary-straddling duplicate that chunk_dedup misses") {
    // doc 1 opens with the passage; doc 2 carries it at offset 17, so
    // in doc 2 it straddles the first 32-token chunk boundary — no
    // aligned 32-token chunk window is identical between the docs.
    val d = docs(
      1L -> (passage + " " + fresh("a", 40)),
      2L -> (fresh("b", 17) + " " + passage + " " + fresh("c", 30)))
    assert(ChunkDedup.spans(d).count() === 0L,
      "precondition: the aligned chunk pass must miss this duplicate")
    val rows = Dedup.exactSubstring(d).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === Set(2L))
    val r = rows.head
    assert(r.getAs[Long]("span_start") === 17L)
    assert(r.getAs[Long]("span_end") === 42L)
  }

  test("self-repetition within one doc flags the later occurrence") {
    val d = docs(1L -> (passage + " " + fresh("x", 5) + " " + passage))
    val rows = Dedup.exactSubstring(d).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("doc_id") === 1L)
    // second copy starts at token 30 (25 passage + 5 filler)
    assert(r.getAs[Long]("span_start") === 30L)
    assert(r.getAs[Long]("span_end") === 55L)
  }

  test("nearby distinct spans merge only when windows overlap or touch") {
    // two shared passages separated by >window fresh tokens → two spans
    val d = docs(
      1L -> (passage + " " + fresh("mid", 30) + " " +
        passage.replace("passage", "other")),
      2L -> (passage + " " + fresh("gap", 30) + " " +
        passage.replace("passage", "other")))
    val rows = Dedup.exactSubstring(d)
      .filter(col("doc_id") === 2L).orderBy("span_start").collect()
    assert(rows.length === 2)
    assert(rows(0).getAs[Long]("span_start") === 0L)
    assert(rows(0).getAs[Long]("span_end") === 25L)
    assert(rows(1).getAs[Long]("span_start") === 55L)
    assert(rows(1).getAs[Long]("span_end") === 80L)
  }

  test("batch-over-store: later batches dedup against the corpus at O(batch)") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-substr-store").toString + "/s"
    // batch 1 seeds the store — nothing to match yet
    val b1 = Dedup.exactSubstringBatch(spark, store,
      docs(1L -> (passage + " " + fresh("a", 40))))
    assert(b1.count() === 0L)
    val stored1 = graft.operators.SnapshotTable.read(spark, store).count()
    assert(stored1 > 0L)
    // batch 2 carries the passage at an offset AND a fresh self-dup
    val b2 = Dedup.exactSubstringBatch(spark, store,
      docs(
        10L -> (fresh("b", 10) + " " + passage + " " + fresh("c", 30)),
        11L -> (fresh("x", 30) + " " + fresh("x", 30))))
    val rows = b2.collect()
    val crossBatch = rows.filter(_.getAs[Boolean]("matched_store"))
    assert(crossBatch.map(_.getAs[Long]("doc_id")).toSet === Set(10L))
    assert(crossBatch.head.getAs[Long]("span_start") === 10L)
    assert(crossBatch.head.getAs[Long]("span_end") === 35L)
    // doc 11 repeats ITSELF within the batch: flagged, but the
    // canonical is in this batch, not the store
    val selfDup = rows.filter(r => r.getAs[Long]("doc_id") == 11L)
    assert(selfDup.nonEmpty && selfDup.forall(
      !_.getAs[Boolean]("matched_store")))
    // replay of batch 2: same verdicts, store unchanged
    val storedAfter = graft.operators.SnapshotTable.read(spark, store).count()
    val replay = Dedup.exactSubstringBatch(spark, store,
      docs(
        10L -> (fresh("b", 10) + " " + passage + " " + fresh("c", 30)),
        11L -> (fresh("x", 30) + " " + fresh("x", 30))))
    assert(replay.count() === b2.count())
    assert(graft.operators.SnapshotTable.read(spark, store).count()
      === storedAfter)
  }

  test("cutSpans removes exactly the spanned tokens, keeps canonicals") {
    val d = docs(
      1L -> (passage + " " + fresh("a", 40)),
      2L -> (fresh("b", 10) + " " + passage + " " + fresh("c", 30)))
    val out = Dedup.cutSpans(d, Dedup.exactSubstring(d))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_removed"))).toMap
    // doc 1 holds the canonical: untouched (rebuilt, zero removed)
    assert(out(1L)._2 === 0L)
    assert(out(1L)._1.startsWith("passage1 "))
    // doc 2 loses the 25-token passage [10, 35): 65 tokens -> 40 kept
    assert(out(2L)._2 === 25L)
    val toks = out(2L)._1.split(" ")
    assert(toks.length === 40)
    assert(!toks.exists(_.startsWith("passage")))
  }

  test("cutSpans preserves casing and handles fully-removed docs") {
    val d = Seq(
      (1L, "Keep This " + passage),
      (2L, "other " + passage + " tail")).toDF("doc_id", "text")
    // a hand-built span covering doc 2 entirely
    val spans = Seq((2L, 0L, 27L)).toDF("doc_id", "span_start", "span_end")
    val out = Dedup.cutSpans(d, spans).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("clean_text"), r.getAs[Long]("n_removed"))).toMap
    assert(out(1L)._1 === "Keep This " + passage) // casing kept
    assert(out(2L)._1 === "" && out(2L)._2 === 27L)
  }

  test("hot-hash plan is skew-safe: aggregate with partials, no Window on wh") {
    // a corpus where ONE window hash is ubiquitous (boilerplate in
    // every doc) — the shape that makes a Window.partitionBy(wh) plan
    // a single straggler task at scale
    val boiler = (1 to 20).map(i => s"license$i").mkString(" ")
    val hot = docs((1L to 200L).map(i =>
      i -> (boiler + " " + fresh(s"u$i", 25))): _*)
    val spans = Dedup.exactSubstring(hot)
    // every doc but the canonical carries the boilerplate span
    assert(spans.count() === 199L)
    val optimized = spans.queryExecution.optimizedPlan
    // per-hash stats must be an Aggregate on wh (map-side partials
    // absorb the hot hash) ...
    val whAggs = optimized.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate
        if a.groupingExpressions.exists(_.references.exists(
          _.name == "wh")) => a
    }
    assert(whAggs.nonEmpty, "expected groupBy(wh) aggregate in the plan")
    // ... and NO Window node partitioned on wh anywhere (the island
    // merge's doc_id window is fine)
    val whWindows = optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.exists(_.references.exists(
          _.name == "wh")) => w
    }
    assert(whWindows.isEmpty, "Window.partitionBy(wh) is the skew-unsafe plan")
    // physical: the wh aggregate runs with a partial (map-side) mode
    spans.collect()
    val phys = spans.queryExecution.executedPlan.toString
    assert(phys.contains("partial_count") || phys.contains("partial_min"),
      s"expected map-side partial aggregation in:\n$phys")
  }

  test("batch-over-store plan shares the skew-safe shape") {
    val store = java.nio.file.Files
      .createTempDirectory("graft-substr-plan").toString + "/s"
    val spans = Dedup.exactSubstringBatch(spark, store,
      docs(1L -> (passage + " " + fresh("a", 40)),
        2L -> (fresh("b", 10) + " " + passage)))
    val whWindows = spans.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
        if w.partitionSpec.exists(_.references.exists(
          _.name == "wh")) => w
    }
    assert(whWindows.isEmpty)
  }

  test("store read folds duplicate canonicals defensively") {
    import graft.operators.SnapshotTable
    val store = java.nio.file.Files
      .createTempDirectory("graft-substr-fold").toString + "/s"
    // simulate a single-writer-contract violation: two rows for hash H
    val twin = Seq(("aa" * 16, 42L, 0L), ("aa" * 16, 7L, 0L),
      ("bb" * 16, 99L, 1L)).toDF("wh", "canon_key", "wh_bucket")
    SnapshotTable.commitAppend(twin, store, "wh_bucket")
    val folded = Dedup.readSubstringStore(spark, store).collect()
      .map(r => r.getAs[String]("wh") -> r.getAs[Long]("canon_key")).toMap
    assert(folded.size === 2)
    assert(folded("aa" * 16) === 7L) // earliest key wins
    assert(folded("bb" * 16) === 99L)
  }

  test("a document at the packed-key ceiling is refused loudly") {
    // ChunkIdSpace tokens would collide doc 1's positions into doc 2's
    // key space — the valve must throw, not corrupt
    val n = ChunkDedup.ChunkIdSpace.toInt
    val big = spark.range(1).select(lit(1L).as("doc_id"),
      expr(s"array_join(transform(sequence(1, $n), x -> 'w'), ' ')")
        .as("text"))
    val e = intercept[Exception] {
      Dedup.exactSubstring(big).count()
    }
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).toSeq
    assert(chain.exists(_.contains("ChunkIdSpace")), chain.mkString("\n"))
  }

  test("docs shorter than the window contribute no windows") {
    val short = (1 to 10).map(i => s"tiny$i").mkString(" ")
    val d = docs(1L -> short, 2L -> short)
    assert(Dedup.exactSubstring(d).count() === 0L)
  }

  test("null text contributes no windows and never trips the valve") {
    // size(NULL) is NULL — without the isNotNull filter the ceiling
    // valve's when() would fall through into raise_error
    val d = Seq((1L, passage + " " + fresh("a", 40)),
      (2L, null: String),
      (3L, fresh("b", 10) + " " + passage)).toDF("doc_id", "text")
    val rows = Dedup.exactSubstring(d).collect()
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === Set(3L))
  }

  test("sf0.001 spans are consistent: inside doc bounds, windows counted") {
    val d = Tables.documents(spark, sf)
    val spans = Dedup.exactSubstring(d)
    val bad = spans.join(
        d.select(col("doc_id"),
          size(split(trim(lower(col("text"))), "\\s+")).cast("long").as("n")),
        Seq("doc_id"))
      .filter(col("span_start") < 0 || col("span_end") > col("n") ||
        col("span_start") >= col("span_end") ||
        col("n_windows") > col("span_end") - col("span_start"))
    assert(bad.count() === 0L)
  }
}
