package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Rounding

/** Corpus retrieval scoring — the TF-IDF / BM25 family a training-data
  * platform uses to rank documents against queries (quality-weighted
  * sampling, targeted corpus slicing, eval-set mining). The reference's
  * pipeline stops at vocabulary statistics (`bronze_to_silver.py`'s
  * token profiling); these are the standard next step over the same
  * tables.
  *
  * Determinism contract (shared with [[TextAnalysis.bigramDocScore]]):
  * no `ln`/`log` anywhere — libm transcendentals are not correctly
  * rounded, so cross-engine bit-equality would be luck. Both scores use
  * the RATIONAL idf forms (`N/df` for TF-IDF, the BM25
  * `(N-df+0.5)/(df+0.5)` ratio without the usual log wrapper): every
  * operation is an IEEE multiply/divide/add with an identical
  * expression tree on the oracle side, then one `roundScaled` at the
  * contract boundary. Rankings are over the ROUNDED score with a full
  * tie-break, so `LIMIT`/`row_number` pick the same rows everywhere.
  */
object Retrieval {

  /** The same whitespace tokenizer every text operator here uses. */
  private def tokens = split(trim(lower(col("text"))), "\\s+")

  /** Per-(doc, term) frequencies — one shuffle on the (doc_id, term)
    * key with map-side partial counts. */
  private def termFreq(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(tokens).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))

  /** Top-k terms per document by TF-IDF (`tf · N / df`, the log-free
    * rational idf — see the object doc for why).
    *
    * Scale: the tf table is one shuffle; df re-aggregates tf on the
    * term key (a second, vocab-sized shuffle — map-side partials make
    * heavy terms combine early); N is a broadcast 1-row aggregate. The
    * per-doc top-k is a window over the doc_id partition — bounded by
    * doc vocabulary, never a global sort; at 100 TB the tf→df join
    * co-partitions on term and the df side (|vocab| rows) broadcasts
    * under the usual threshold. */
  def tfIdf(docs: DataFrame, k: Int = 5): DataFrame = {
    val tf = termFreq(docs)
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = broadcast(docs.agg(count(lit(1)).as("n_docs")))
    tf.join(df, "term").crossJoin(n)
      .withColumn("tf_idf", Rounding.roundScaled(
        col("tf").cast("double") * col("n_docs").cast("double") /
          col("df").cast("double"), 8))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("tf_idf").desc, col("term"))))
      .filter(col("rnk") <= k)
      .select("doc_id", "term", "tf", "df", "tf_idf", "rnk")
  }

  /** The fixed keyword query [[bm25Search]] scores by default — terms
    * that actually occur in the synthetic corpus vocabulary. */
  val DefaultQuery: Seq[String] = Seq("merge", "spark", "vector", "window")

  /** BM25 keyword search: rank documents against a bag-of-words query,
    * `score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b + b·dl/avgdl))`
    * with the standard k1=1.2, b=0.75 and the RATIONAL idf (no log —
    * object doc). Docs containing none of the query terms score 0 and
    * are omitted. Constants are written as the same decimal literals on
    * both engines (never computed, e.g. k1+1 pre-folded to 2.2) so the
    * parsed doubles agree bit-for-bit.
    *
    * Determinism: the per-doc sum folds contributions in term order
    * (sort_array(collect_list) here, `list(... ORDER BY term)` +
    * list_reduce in the oracle) — a plain SUM over doubles would be
    * partition-order dependent. Final ranking is rounded-score desc,
    * doc_id asc: a total order, so LIMIT k is stable.
    *
    * Scale: tf is the one corpus-sized shuffle; the query-term filter
    * cuts it to |query|·n_docs rows BEFORE any join; df restricted to
    * query terms and the (n_docs, Σdl) stats row are broadcast; the
    * doc-length join co-partitions on doc_id. The final top-k is
    * `TakeOrderedAndProject` — a bounded per-partition heap, never a
    * global sort. */
  def bm25Search(docs: DataFrame, query: Seq[String] = DefaultQuery,
                 k: Int = 20): DataFrame = {
    val qTerms = query.distinct.sorted
    val tf = termFreq(docs)
    val qtf = tf.filter(col("term").isin(qTerms: _*))
    val df = broadcast(qtf.groupBy("term").agg(count(lit(1)).as("df")))
    val dls = docs.select(col("doc_id"), size(tokens).cast("bigint").as("dl"))
    val stats = broadcast(dls.agg(
      count(lit(1)).as("n_docs"), sum("dl").as("sum_dl")))
    val contribs = qtf
      .join(df, "term")
      .join(dls, "doc_id")
      .crossJoin(stats)
      .withColumn("avgdl",
        col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn("idf",
        (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5d)) /
          (col("df").cast("double") + lit(0.5d)))
      .withColumn("contrib",
        col("idf") * (col("tf").cast("double") * lit(2.2d)) /
          (col("tf").cast("double") +
            lit(1.2d) * (lit(0.25d) +
              lit(0.75d) * (col("dl").cast("double") / col("avgdl")))))
    contribs.groupBy("doc_id")
      .agg(max(col("dl")).as("dl"),
        count(lit(1)).as("n_hits"),
        sort_array(collect_list(struct(col("term"), col("contrib"))))
          .as("cs"))
      .select(col("doc_id"), col("dl"), col("n_hits"),
        Rounding.roundScaled(
          expr("aggregate(cs, cast(0 as double), (acc, s) -> acc + s.contrib)"),
          8).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(k)
  }

  private def bm25Dir(root: String, v: Long): String =
    MetaIO.join(root, s"v=$v", "_bm25").toString

  /** How many postings one inverted-list row may carry: hot terms
    * (stopwords touch every document) split into `doc_id`-range chunks
    * so no single row grows with the corpus — query-path explode
    * concatenates chunks transparently, and per-(doc, term)
    * contributions are chunk-invariant. */
  val PostingChunkDocs: Long = 1L << 18

  /** Build the INVERTED-INDEX sidecar for a stored documents snapshot
    * table — the [[FuzzyJoin.collectGramStats]] pattern applied to
    * retrieval (the Lucene posting-list shape, Spark-native): one
    * corpus pass records, per term, the document frequency and the
    * chunked posting list `[(doc_id, tf, dl), ...]` (doc length
    * carried IN the posting so the query path needs no doc join),
    * plus the corpus scalars (n_docs, Σdl). [[bm25SearchStored]] then
    * answers a query from ~‖query‖ posting rows — ZERO corpus scans.
    *
    * Layout: postings range-partitioned and sorted by (term, chunk),
    * so a query's `term IN (...)` prunes parquet row groups; chunk
    * contents are `sort_array`ed (deterministic bytes). Idempotent per
    * version; the postings dir lands first and the scalars file — the
    * coverage marker readers key on — publishes LAST and atomically,
    * so a half-built index is invisible. Returns the version
    * covered. */
  /** The chunked posting-list frame for a doc slice: per (term, chunk)
    * the sorted `[(doc_id, tf, dl, ps), ...]` list plus the
    * slice-local per-term df — ONE layout shared by full builds,
    * delta segments, and compaction merges (a format change lands
    * everywhere at once). `ps` is the sorted in-doc POSITION list
    * (token offsets) — the Lucene positional-postings field that
    * makes [[phraseSearch]] answerable from the index; BM25 readers
    * ignore it. */
  private def chunkedPostings(docs: DataFrame): DataFrame = {
    val dls = docs.select(col("doc_id"),
      size(tokens).cast("bigint").as("dl"))
    val tp = docs.select(col("doc_id"),
      posexplode(tokens).as(Seq("pos", "term")))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("ps"))
    tp.join(dls, "doc_id")
      .withColumn("chunk", expr(s"doc_id div ${PostingChunkDocs}L"))
      .groupBy("term", "chunk")
      .agg(sort_array(collect_list(
        struct(col("doc_id"), col("tf"), col("dl"), col("ps"))))
        .as("postings"))
      .join(tp.groupBy("term").agg(count(lit(1)).as("df")), "term")
  }

  /** Write one posting segment: tmp dir first, atomic tree swap into
    * `v=$version/_bm25/$name`. Returns the root-relative segment
    * path. */
  private def writeSegment(chunked: DataFrame, root: String,
                           version: Long, name: String): String = {
    val tmp = MetaIO.join(root, s"v=$version",
      s".bm25.new-${java.util.UUID.randomUUID()}")
    chunked
      .repartitionByRange(col("term"), col("chunk"))
      .sortWithinPartitions("term", "chunk")
      .write.mode("overwrite").parquet(tmp.toString)
    val dir = bm25Dir(root, version)
    MetaIO.mkdirs(dir)
    val segDir = MetaIO.join(dir, name)
    MetaIO.delete(segDir, recursive = true)
    MetaIO.moveTree(tmp, segDir)
    s"v=$version/_bm25/$name"
  }

  /** Publish a version's coverage record: corpus scalars, the covered
    * doc-id range (`[0, -1]` = empty corpus — the DISJOINTNESS guard
    * [[indexCorpusDelta]] checks appends against), and the segment
    * list. Atomic — readers key on this file. */
  private def publishIndexMeta(root: String, v: Long, nDocs: Long,
                               sumDl: Long, docRange: (Long, Long),
                               segs: Seq[String]): Unit = {
    // an empty corpus publishes coverage with no segment dir — the
    // publish tmp file still needs its parent
    MetaIO.mkdirs(bm25Dir(root, v))
    MetaIO.publishString(MetaIO.join(bm25Dir(root, v), "stats"),
      s"n_docs=$nDocs\nsum_dl=$sumDl\n" +
        s"min_doc=${docRange._1}\nmax_doc=${docRange._2}\n" +
        s"segments=${segs.mkString(",")}")
  }

  /** The (n_docs, Σdl, [min_doc, max_doc]) scalars of a doc slice;
    * an empty slice reports the canonical empty range `[0, -1]`. */
  private def sliceScalars(docs: DataFrame): (Long, Long, (Long, Long)) = {
    val r = docs.select(col("doc_id"), size(tokens).cast("bigint").as("dl"))
      .agg(count(lit(1)), coalesce(sum("dl"), lit(0L)),
        min("doc_id"), max("doc_id")).head()
    (r.getLong(0), r.getLong(1),
      if (r.getLong(0) == 0L) (0L, -1L) else (r.getLong(2), r.getLong(3)))
  }

  def indexCorpus(spark: org.apache.spark.sql.SparkSession, root: String,
                  version: Long = -1L): Long = {
    val v = if (version >= 0) version else SnapshotTable.latestVersion(root)
    require(v >= 0, s"no committed version at $root")
    if (MetaIO.exists(MetaIO.join(bm25Dir(root, v), "stats")))
      return v // idempotent
    val docs = SnapshotTable.read(spark, root, v)
    val (n, s, range) = sliceScalars(docs)
    val segs =
      if (n == 0L) Seq.empty[String] // empty corpus: coverage, no dir
      else Seq(writeSegment(chunkedPostings(docs), root, v, "postings"))
    publishIndexMeta(root, v, n, s, range, segs)
    v
  }

  /** The parsed coverage record for a version's index: total corpus
    * scalars, the covered doc-id range (None on pre-range records —
    * the delta path then declines to full rebuild), and the SEGMENT
    * list (one for a full build, one per covered append, the
    * Lucene-segment model). An `n_docs=0` record legitimately carries
    * zero segments. */
  private def readIndexMeta(root: String, v: Long)
      : Option[(Long, Long, Seq[String], Option[(Long, Long)])] =
    scala.util.Try {
      val kv = MetaIO.readString(MetaIO.join(bm25Dir(root, v), "stats"))
        .split("\n").map(_.split("=", 2))
        .collect { case Array(key, x) => key -> x }.toMap
      for {
        n <- kv.get("n_docs").flatMap(_.toLongOption)
        s <- kv.get("sum_dl").flatMap(_.toLongOption)
      } yield (n, s,
        kv.get("segments").map(_.split(",").toSeq.filter(_.nonEmpty))
          .getOrElse(Seq(s"v=$v/_bm25/postings")),
        for {
          lo <- kv.get("min_doc").flatMap(_.toLongOption)
          hi <- kv.get("max_doc").flatMap(_.toLongOption)
        } yield (lo, hi))
    }.toOption.flatten

  /** INCREMENTAL index maintenance (the Lucene segment model): when
    * `version`'s history since the newest covered ancestor is
    * APPEND-ONLY, index ONLY the appended rows as a new posting
    * SEGMENT and record `version`'s coverage as the ancestor's
    * segments + the new one — O(batch) per maintained version, never
    * a corpus re-index. Correct only when doc sets stay DISJOINT
    * across segments (per-term df totals are segment sums, the corpus
    * scalars add, and each (doc, term) posting lives in exactly one
    * segment — [[bm25SearchStored]] aggregates df across segments at
    * query time; for a single segment that sum is the recorded df, so
    * the full-build path is untouched) — append-only FILES do not by
    * themselves guarantee disjoint doc_ids, so the appended batch's
    * doc-id range is checked against the covered `[min_doc, max_doc]`
    * and any OVERLAP falls back to a full rebuild (conservative:
    * interleaved-but-distinct ids rebuild unnecessarily; a duplicated
    * id can never silently double-count). Rewritten or deleted history
    * (compaction, MoR deletes — an old doc may have vanished,
    * invalidating ancestor segments) also falls back. Idempotent per
    * version; segment dir first, stats published atomically last. */
  def indexCorpusDelta(spark: org.apache.spark.sql.SparkSession,
                       root: String, version: Long = -1L): Long = {
    val v = if (version >= 0) version else SnapshotTable.latestVersion(root)
    require(v >= 0, s"no committed version at $root")
    if (MetaIO.exists(MetaIO.join(bm25Dir(root, v), "stats")))
      return v // idempotent
    // nearest covered ancestor — lazily, so a long version history
    // pays one metadata read, not thousands
    val parent = ((v - 1) to 0L by -1L).iterator
      .flatMap(p => readIndexMeta(root, p).map(p -> _))
      .nextOption()
    val appended = parent.flatMap { case (p, _) =>
      // appendedBetween REFUSES rewritten history; unapplied deletes
      // at v may hollow out ancestor segments — both mean full rebuild
      scala.util.Try {
        require(SnapshotTable.deleteEntries(root, v).isEmpty &&
          SnapshotTable.eqDeleteEntries(root, v).isEmpty,
          "live MoR deletes may hollow out ancestor segments")
        SnapshotTable.appendedBetween(spark, root, p, v)
      }.toOption
    }
    (parent, appended) match {
      case (Some((_, (pn, ps, psegs, Some((plo, phi))))), Some(delta)) =>
        val (dn, dsum, (dlo, dhi)) = sliceScalars(delta)
        val overlaps = // both ranges non-empty and intersecting
          pn > 0L && dn > 0L && dlo <= phi && plo <= dhi
        if (overlaps) return indexCorpus(spark, root, v)
        val segs =
          if (dn == 0L) psegs // nothing appended: coverage carries over
          else psegs :+
            writeSegment(chunkedPostings(delta), root, v, s"seg-$v")
        val range =
          if (pn == 0L) (dlo, dhi)
          else if (dn == 0L) (plo, phi)
          else (math.min(plo, dlo), math.max(phi, dhi))
        publishIndexMeta(root, v, pn + dn, ps + dsum, range, segs)
        v
      case _ => indexCorpus(spark, root, v)
    }
  }

  /** SEGMENT COMPACTION (the Lucene merge policy): fold a version's
    * accumulated posting segments into ONE merged segment — each delta
    * append adds a segment the query must union, so a long append
    * history taxes every query with a per-segment scan; the merge
    * re-groups POSTINGS (union → explode → regroup by (term, chunk)),
    * never re-tokenizing the corpus — cost is the index size, not the
    * text. Per-term df is the exact long sum of the disjoint segments'
    * dfs (the same arithmetic the query path does on the fly); corpus
    * scalars carry over unchanged, so answers are bit-identical before
    * and after (spec-pinned). Idempotent: one segment is left alone.
    * The merged dir lands first, the stats rewrite publishes
    * atomically last. Superseded segment dirs are NOT deleted: a
    * later version's coverage record (or an in-flight query that
    * already loaded the old stats) may still chain to them, and no
    * check here can close that window — they are dead weight on disk
    * until [[SnapshotTable]] version expiry removes their version
    * dirs wholesale, the same retention rule every sidecar follows.
    * Returns the segment count after. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
                   root: String, version: Long = -1L): Int = {
    val v = if (version >= 0) version else SnapshotTable.latestVersion(root)
    require(v >= 0, s"no committed version at $root")
    val meta = readIndexMeta(root, v).getOrElse(
      throw new IllegalStateException(
        s"no index coverage at $root v=$v — run indexCorpus first"))
    val (nDocs, sumDl, segs, range) = meta
    if (segs.size <= 1) return segs.size // idempotent
    val post = segs.map(sp =>
      spark.read.parquet(MetaIO.join(root, sp).toString)
        .withColumn("_seg", lit(sp)))
      .reduce(_ unionByName _)
    val dfTot = post.select("_seg", "term", "df").distinct()
      .groupBy("term").agg(sum("df").as("df"))
    val merged = post
      .select(col("term"), explode(col("postings")).as("p"))
      .withColumn("chunk", expr(s"p.doc_id div ${PostingChunkDocs}L"))
      .groupBy("term", "chunk")
      .agg(sort_array(collect_list(col("p"))).as("postings"))
      .join(dfTot, "term")
    val seg = writeSegment(merged, root, v, s"merged-$v")
    publishIndexMeta(root, v, nDocs, sumDl,
      range.getOrElse((0L, -1L)), Seq(seg))
    1
  }

  /** The fixed phrase [[phraseSearch]] answers by default — an
    * adjacent pair that occurs in the synthetic corpus. */
  val DefaultPhrase: Seq[String] = Seq("merge", "group")

  /** PHRASE SEARCH over the positional postings — the capability the
    * `ps` field exists for (Lucene's exact-phrase query): find every
    * document containing the EXACT adjacent token sequence `phrase`,
    * with its occurrence count (overlapping occurrences counted —
    * position arithmetic, not regex). The query reads only the phrase
    * terms' posting rows (term-pruned, unioned across segments; a doc
    * lives wholly in ONE segment, so in-doc adjacency never crosses a
    * segment boundary) — ZERO corpus scans. The match is an iterated
    * positional intersection: positions of term i that extend a match
    * of terms 0..i-1 = `array_intersect(acc + 1, ps_i)` — ‖phrase‖−1
    * co-partitioned doc_id joins over ≤‖matching docs‖ rows. Falls
    * back to a corpus scan when the index does not cover the version.
    * Output: (doc_id, n_occurrences) for matching docs, doc_id
    * order. */
  def phraseSearch(spark: org.apache.spark.sql.SparkSession,
                   root: String, phrase: Seq[String] = DefaultPhrase,
                   version: Long = -1L): DataFrame = {
    require(phrase.nonEmpty, "phrase needs at least one term")
    val v = if (version >= 0) version else SnapshotTable.latestVersion(root)
    require(v >= 0, s"no committed version at $root")
    readIndexMeta(root, v) match {
      case None =>
        phraseScan(SnapshotTable.read(spark, root, v), phrase)
      case Some((_, _, segs, _)) if segs.isEmpty =>
        import spark.implicits._
        Seq.empty[(Long, Int)].toDF("doc_id", "n_occurrences")
      case Some((_, _, segs, _)) =>
        val post = segs.map(sp =>
          spark.read.parquet(MetaIO.join(root, sp).toString))
          .reduce(_ unionByName _)
          .filter(col("term").isin(phrase.distinct: _*))
          .select(col("term"), explode(col("postings")).as("p"))
          .select(col("term"), col("p.doc_id").as("doc_id"),
            col("p.ps").as("ps"))
        def ofTerm(t: String, as: String): DataFrame =
          post.filter(col("term") === t)
            .select(col("doc_id"), col("ps").as(as))
        val first = ofTerm(phrase.head, "acc")
        val matched = phrase.zipWithIndex.tail.foldLeft(first) {
          case (cur, (t, i)) =>
            cur.join(ofTerm(t, s"ps_$i"), "doc_id")
              .withColumn("acc", expr(
                s"array_intersect(transform(acc, x -> x + 1), ps_$i)"))
              .filter(size(col("acc")) > 0)
              .drop(s"ps_$i")
        }
        matched
          .select(col("doc_id"),
            size(col("acc")).as("n_occurrences"))
          .orderBy("doc_id")
    }
  }

  /** The scan-path twin of [[phraseSearch]] (uncovered versions, and
    * the spec's equivalence anchor): per doc, count the positions
    * whose adjacent token run equals the phrase. */
  private[graft] def phraseScan(docs: DataFrame,
                                phrase: Seq[String]): DataFrame = {
    val arr = s"array(${phrase.map(t => s"'${t.replace("'", "\\'")}'")
      .mkString(", ")})"
    docs
      .select(col("doc_id"), tokens.as("w"))
      .withColumn("n_occurrences", expr(
        s"""if(size(w) >= ${phrase.length},
           |  size(filter(sequence(0, size(w) - ${phrase.length}),
           |    i -> slice(w, i + 1, ${phrase.length}) == $arr)),
           |  0)""".stripMargin))
      .filter(col("n_occurrences") > 0)
      .select("doc_id", "n_occurrences")
      .orderBy("doc_id")
  }

  /** [[bm25Search]] over a STORED documents table through the
    * [[indexCorpus]] inverted index: the query reads ~‖query‖ posting
    * rows (term-pruned parquet row groups, unioned across the
    * version's SEGMENTS) and never scans the corpus — bit-identical
    * to the scan path (per-term df is the exact long sum of the
    * disjoint segments' dfs, then the same contribution expression
    * tree over the same (tf, df, dl, N, Σdl) operands and the same
    * term-ordered fold), which the shared oracle proves. Falls back
    * to the corpus-scanning [[bm25Search]] when the sidecar does not
    * cover the version (or is unreadable), answer-identical either
    * way. */
  def bm25SearchStored(spark: org.apache.spark.sql.SparkSession,
                       root: String, query: Seq[String] = DefaultQuery,
                       k: Int = 20, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else SnapshotTable.latestVersion(root)
    require(v >= 0, s"no committed version at $root")
    readIndexMeta(root, v) match {
      case None => // uncovered version: the scan path is the answer
        bm25Search(SnapshotTable.read(spark, root, v), query, k)
      case Some((_, _, segs, _)) if segs.isEmpty =>
        // covered-but-empty corpus: zero hits, no reads of anything
        import spark.implicits._
        Seq.empty[(Long, Long, Long, Double)]
          .toDF("doc_id", "dl", "n_hits", "bm25")
      case Some((nDocs, sumDl, segs, _)) =>
        val qTerms = query.distinct.sorted
        val post = segs.map(sp =>
          spark.read.parquet(MetaIO.join(root, sp).toString)
            .withColumn("_seg", lit(sp)))
          .reduce(_ unionByName _)
          .filter(col("term").isin(qTerms: _*))
        // per-term df = exact sum over disjoint segments (df repeats
        // on each chunk row WITHIN a segment → distinct first); tiny:
        // ≤ ‖query‖ × segments rows, broadcast back
        val dfTot = post.select("_seg", "term", "df").distinct()
          .groupBy("term").agg(sum("df").as("df"))
        val contribs = post
          .select(col("term"), explode(col("postings")).as("p"))
          .join(broadcast(dfTot), "term")
          .select(col("term"), col("df"), col("p.doc_id"),
            col("p.tf"), col("p.dl"))
          .withColumn("avgdl",
            lit(sumDl).cast("double") / lit(nDocs).cast("double"))
          .withColumn("idf",
            (lit(nDocs).cast("double") - col("df").cast("double") +
              lit(0.5d)) / (col("df").cast("double") + lit(0.5d)))
          .withColumn("contrib",
            col("idf") * (col("tf").cast("double") * lit(2.2d)) /
              (col("tf").cast("double") +
                lit(1.2d) * (lit(0.25d) +
                  lit(0.75d) * (col("dl").cast("double") / col("avgdl")))))
        contribs.groupBy("doc_id")
          .agg(max(col("dl")).as("dl"),
            count(lit(1)).as("n_hits"),
            sort_array(collect_list(struct(col("term"), col("contrib"))))
              .as("cs"))
          .select(col("doc_id"), col("dl"), col("n_hits"),
            Rounding.roundScaled(
              expr("aggregate(cs, cast(0 as double), " +
                "(acc, s) -> acc + s.contrib)"), 8).as("bm25"))
          .orderBy(col("bm25").desc, col("doc_id"))
          .limit(k)
    }
  }

  /** HYBRID SEARCH — Reciprocal Rank Fusion (Cormack et al. 2009) of
    * the lexical [[bm25Search]] leg over `docs` and a dense
    * cosine-similarity leg over `emb` (query = the `queryVec` row's
    * embedding, the query-by-example form): each leg contributes
    * `1/(kRrf + rank)` for the documents in its top-`n`, fused scores
    * rank the final top-`k`. RRF is the standard production fusion for
    * keyword+vector retrieval because it needs NO score calibration —
    * only ranks cross the leg boundary, so a BM25 scale change or an
    * embedding roll never re-weights the fusion.
    *
    * Determinism: ranks are integers from totally-ordered legs (score
    * desc, id asc — both leg scores already replay bit-for-bit in the
    * oracle, see [[bm25Search]] / `ann_topk`), and the fused score is
    * two IEEE divides added in a fixed order (lexical + dense) then
    * [[Rounding.roundScaled]] at the contract boundary. Absent-leg
    * ranks surface as 0 with a 0 contribution.
    *
    * Scale: each leg ends in a `TakeOrderedAndProject` bounded heap
    * (never a global sort) — the lexical leg's cost is [[bm25Search]]'s
    * (query-term-filtered tf), the dense leg is one broadcast-query
    * scan of the embedding table; the fusion then full-outer-joins two
    * ≤`n`-row frames (broadcast, sub-millisecond) so fusion cost is
    * independent of corpus size. The `row_number` windows run over
    * those ≤`n`-row frames, not the corpus. */
  def hybridSearch(docs: DataFrame, emb: DataFrame,
                   query: Seq[String] = DefaultQuery, queryVec: Long = 0L,
                   n: Int = 50, k: Int = 20, kRrf: Int = 60): DataFrame = {
    val lex = bm25Search(docs, query, n)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
          .as("lex_rank"))
    val nrm = Similarity.withNorms(emb)
    val q = nrm.filter(col("vec_id") === queryVec)
      .select(col("embedding").as("q_embedding"), col("nrm").as("q_nrm"))
    val denseTop = nrm.filter(col("vec_id") =!= queryVec)
      .crossJoin(broadcast(q))
      .withColumn("cosine",
        graft.functions.DotProduct.dot(col("embedding"), col("q_embedding")) /
          (col("nrm") * col("q_nrm")))
      .orderBy(col("cosine").desc, col("vec_id")).limit(n)
    val dense = denseTop
      .select(col("vec_id").as("doc_id"),
        row_number().over(Window.orderBy(col("cosine").desc, col("vec_id")))
          .as("dense_rank"))
    fuseRrf(lex, dense, kRrf, k)
  }

  /** The RRF fusion tail shared by [[hybridSearch]] and
    * [[hybridSearchStored]]: full-outer join of two ≤n-row ranked leg
    * frames (`doc_id`, `lex_rank`/`dense_rank`), fused score =
    * Σ 1/(kRrf + rank) over present legs added lexical-then-dense,
    * rounded at the boundary; absent legs surface as rank 0. */
  private def fuseRrf(lex: DataFrame, dense: DataFrame, kRrf: Int,
                      k: Int): DataFrame = {
    def contrib(rank: Column): Column =
      coalesce(lit(1.0d) / (lit(kRrf.toDouble) + rank.cast("double")),
        lit(0.0d))
    lex.join(dense, Seq("doc_id"), "full_outer")
      .withColumn("rrf", Rounding.roundScaled(
        contrib(col("lex_rank")) + contrib(col("dense_rank")), 8))
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("dense_rank"), lit(0)).as("dense_rank"), col("rrf"))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
  }

  /** [[hybridSearch]] with BOTH legs index-backed — the fully STORED
    * serving hybrid: the lexical leg reads ~‖query‖ posting rows from
    * [[indexCorpus]]'s inverted index (zero corpus scans), the dense
    * leg probes [[IncrementalIvf]]'s persisted centroid-partitioned
    * lists (partition-pruned to `nprobe` lists — zero embedding-table
    * scans), and the fusion is the same calibration-free RRF. The
    * dense leg is the IVF approximation (ranked within probed lists),
    * exactly [[IncrementalIvf.search]]'s semantics — the oracle
    * replays both legs and the fusion bit-for-bit. `queryEmb` supplies
    * the query-by-example vector (`vec_id = queryVec` row). */
  def hybridSearchStored(spark: org.apache.spark.sql.SparkSession,
                         docsRoot: String, ivfRoot: String,
                         queryEmb: DataFrame,
                         query: Seq[String] = DefaultQuery,
                         queryVec: Long = 0L, n: Int = 50, k: Int = 20,
                         nprobe: Int = 4, kRrf: Int = 60): DataFrame = {
    val lex = bm25SearchStored(spark, docsRoot, query, n)
      .select(col("doc_id"),
        row_number().over(Window.orderBy(col("bm25").desc, col("doc_id")))
          .as("lex_rank"))
    val dense = IncrementalIvf
      .search(spark, ivfRoot,
        queryEmb.filter(col("vec_id") === queryVec)
          .select("vec_id", "embedding"),
        nprobe, n)
      .select(col("neighbor_id").as("doc_id"),
        col("rank").as("dense_rank"))
    fuseRrf(lex, dense, kRrf, k)
  }
}
