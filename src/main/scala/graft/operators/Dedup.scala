package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Document deduplication for LLM training-data pipelines.
  *
  * Four dedup families over the `documents` table, all designed as
  * bucket/inverted-index joins — candidate generation is
  * O(Σ bucket²), never an all-pairs crossJoin, so each survives a
  * 100 TB corpus given a sane shingle/band distribution:
  *
  *  - exact:   md5 content hash groupBy (one shuffle);
  *  - n-gram:  word-3-gram inverted index self-join → exact Jaccard;
  *  - MinHash: 128-perm signatures computed per-doc with higher-order
  *             functions (NO shuffle for signature building), 32×4 LSH
  *             banding, bucket join, exact-Jaccard verify;
  *  - SimHash: 60-bit fingerprints, 4×15-bit bands, Hamming verify.
  *
  * All hashing bottoms out in md5/integer arithmetic mirrored exactly by
  * the DuckDB oracle (see graft.functions.Hashing).
  *
  * Caching contract: the LSH operators `persist()` their signature /
  * shingle projections (they feed both sides of a self-join — see the
  * projection-collapse note on minhashLsh). The cached stages live for
  * the session; long-lived callers issuing many dedup jobs should
  * `spark.sharedState.cacheManager.clearCache()` between them (as
  * Bench/Verify do) or unpersist after consuming the result.
  */
object Dedup {

  /** doc_id, w (tokens), shingles (distinct word-3-grams).
    *
    * The shingle expression only touches `w` at the top level (slices +
    * zip_with lambda ARGS, never a captured column inside a lambda
    * body): Catalyst's projection collapse inlines captured columns
    * into lambda bodies, which would re-run the regexp split once per
    * shingle — O(len²) per doc, measured 10× on the profile. */
  def shingled(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", split(trim(lower(col("text"))), "\\s+"))
      .withColumn("shingles", expr(
        "array_distinct(zip_with(" +
          "zip_with(slice(w, 1, greatest(size(w) - 2, 0)), " +
          "slice(w, 2, greatest(size(w) - 2, 0)), (a, b) -> concat(a, ' ', b)), " +
          "slice(w, 3, greatest(size(w) - 2, 0)), (ab, c) -> concat(ab, ' ', c)))"))

  /** Exact dedup: hash-groupBy on content md5, keep min doc_id. */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(md5(col("text").cast("binary")).as("content_hash"))
      .agg(min("doc_id").as("keep_doc_id"), count(lit(1)).as("n_docs"))

  /** Default candidate-generation cap for [[ngramJaccard]]: shingles in
    * more than this many documents are excluded from the inverted-index
    * join (each contributes f² join rows — the textbook skewed-key
    * blowup at corpus scale). Verification recomputes Jaccard from FULL
    * shingle sets, so every reported score is exact.
    *
    * Recall bound (stated honestly): a pair is found only if it shares
    * at least one shingle with doc-frequency ≤ cap. Inside a near-dup
    * cluster larger than the cap, the shared shingles themselves exceed
    * the cap, so such intra-cluster pairs are NOT reported — the cap
    * trades recall on ≥cap-sized duplicate clusters (which exact-dedup
    * and MinHash-LSH still catch) for O(Σ df²) join-safety at corpus
    * scale. The DuckDB oracle applies the identical cap, so both sides
    * of the correctness contract compute the same capped semantics;
    * pass `maxDocFreq = None` for the uncapped exact index. */
  val DefaultMaxDocFreq = 100

  /** [[ngramJaccard]] with the cap tied to corpus size instead of an
    * absolute count: cap = max(floor, fraction·|docs|). A fixed df cap
    * tuned at one scale over-prunes a 1000× larger corpus (boilerplate
    * df grows with the corpus while near-dup cluster sizes do not), so
    * at warehouse scale the fraction is the right knob; the |docs|
    * count is one column-pruned scan. */
  def ngramJaccardScaled(docs: DataFrame, threshold: Double = 0.8,
                         capFraction: Double = 0.02,
                         capFloor: Int = DefaultMaxDocFreq): DataFrame = {
    val cap = math.max(capFloor.toLong, (docs.count() * capFraction).toLong)
    ngramJaccard(docs, threshold,
      maxDocFreq = Some(math.min(cap, Int.MaxValue.toLong).toInt))
  }

  /** Exact word-3-gram Jaccard pairs ≥ `threshold`, via a shingle
    * inverted-index join. `maxDocFreq` (default [[DefaultMaxDocFreq]])
    * is the 100 TB scale valve — see its doc; pass `None` to force the
    * uncapped exact index (every pair guaranteed, O(Σ df²) join work). */
  def ngramJaccard(docs: DataFrame, threshold: Double = 0.8,
                   maxDocFreq: Option[Int] = Some(DefaultMaxDocFreq)): DataFrame = {
    // persist: the shingle projection feeds both join sides + the sizes
    val sh = shingled(docs).select("doc_id", "shingles").persist()
    val invAll = sh.select(col("doc_id"), explode(col("shingles")).as("sh"))
    val (inv, freqSets) = maxDocFreq match {
      case Some(cap) =>
        // Frequent stop list: |{sh : df > cap}| ≤ Σdf/cap is small by
        // construction, so its joins below stay broadcast-sized.
        val frequent = invAll.groupBy("sh").agg(count(lit(1)).as("df"))
          .filter(col("df") > cap).select("sh").persist()
        // Per-doc frequent-shingle sets (boilerplate only — bounded by
        // the doc's above-cap shingles, not its size): these restore
        // exact intersection counts after the capped index join.
        val fs = invAll.join(frequent, Seq("sh"))
          .groupBy("doc_id").agg(collect_set(col("sh")).as("fr"))
        // Persist the capped index: it feeds BOTH self-join sides, and
        // without a materialization barrier each side re-runs the df
        // aggregate. The cached size is also REAL (the parquet-derived
        // estimate is not), so the self-join strategy follows actual
        // data size — broadcast while the index fits the threshold,
        // sort-merge beyond it. At warehouse scale this persist is the
        // posting-list table write.
        (invAll.join(frequent, Seq("sh"), "left_anti").persist(), Some(fs))
      case None => (invAll, None)
    }
    val sizes = sh.select(col("doc_id"), size(col("shingles")).as("n_sh"))
    // pairwise shared-shingle counts straight off the (possibly capped)
    // index: one groupBy count, never a per-pair array intersection over
    // full shingle sets (1.1M candidate pairs × 50-element arrays
    // measured 4× the whole query's cost at sf0.1)
    val nInterIdx = inv.as("a").join(inv.as("b"), "sh")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_inter_idx"))
    val nInter = freqSets match {
      case None => nInterIdx.withColumn("n_inter", col("n_inter_idx"))
      case Some(fs) =>
        // exactness under the cap: add back the overlap of the per-doc
        // frequent-shingle sets (tiny arrays, left-joined to candidates)
        nInterIdx
          .join(fs.select(col("doc_id").as("doc_a"), col("fr").as("fr_a")),
            Seq("doc_a"), "left")
          .join(fs.select(col("doc_id").as("doc_b"), col("fr").as("fr_b")),
            Seq("doc_b"), "left")
          .withColumn("n_inter", col("n_inter_idx") +
            when(col("fr_a").isNull || col("fr_b").isNull, lit(0))
              .otherwise(size(array_intersect(col("fr_a"), col("fr_b")))))
    }
    nInter
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_a", "n_sh" -> "n_a")), "doc_a")
      .join(sizes.withColumnsRenamed(Map("doc_id" -> "doc_b", "n_sh" -> "n_b")), "doc_b")
      .withColumn("jaccard",
        col("n_inter").cast("double") /
          (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** 60-bit md5-prefix hash of a UTF-8 string — bit-identical to the
    * SQL `conv(substr(md5(s), 1, 15), 16, 10)` used by the oracle. */
  private[graft] def md5Prefix60(md: java.security.MessageDigest,
                                 s: String): Long = {
    md.reset()
    val b = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) >> 4) & 0xfL) // 15 hex chars = 7.5 bytes
  }

  /** 128-perm MinHash signatures `(doc_id, mh)` of a shingled
    * projection — the kernel shared by [[minhashLsh]] and
    * [[IncrementalDedup]] (whose persisted signature STORE is exactly
    * this table). Typed mapPartitions: 128 perms × |shingles|
    * primitive-long ops per doc, batched per partition with one
    * MessageDigest — no shuffle, no boxing (the equivalent declarative
    * higher-order-function pipeline measured ~10× slower interpreted).
    * Arithmetic is identical to the DuckDB oracle:
    * (a·(sid60 % P) + b) % P. */
  private[graft] def signatures(shl: DataFrame): DataFrame = {
    val sess = shl.sparkSession
    import sess.implicits._
    val aArr = Hashing.perms.map(_._1).toArray
    val bArr = Hashing.perms.map(_._2).toArray
    val nPerms = Hashing.NumPerms
    val p = Hashing.P
    shl.as[(Long, Seq[String])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, shingles) =>
          val mh = Array.fill(nPerms)(Long.MaxValue)
          shingles.foreach { s =>
            val sid = md5Prefix60(md, s) % p
            var k = 0
            while (k < nPerms) {
              val h = (aArr(k) * sid + bArr(k)) % p
              if (h < mh(k)) mh(k) = h
              k += 1
            }
          }
          (id, mh)
        }
      }.toDF("doc_id", "mh")
  }

  /** LSH banding of a `(doc_id, mh)` signature table: one row per
    * (doc_id, band, sig) — the join key of every minhash bucket join. */
  private[graft] def bandsOf(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"),
      expr(s"inline(transform(sequence(0, ${Hashing.BandsMinhash - 1}), b -> " +
        "struct(b as band, concat_ws(',', transform(slice(mh, b * 4 + 1, 4), " +
        "v -> cast(v as string))) as sig)))"))

  /** MinHash-LSH near-dup pairs: banding → bucket join → exact-Jaccard
    * verify ≥ `threshold`.
    *
    * The signature projection is persisted before banding: without a
    * materialization barrier, Catalyst's projection collapse inlines the
    * (interpreted, 128·|shingles|-op) signature expression into the band
    * generator's lambda — recomputing it once per band and again on each
    * self-join side (a measured 30× blowup). At warehouse scale the
    * equivalent is writing the signature table once and joining on it.
    * Only (doc_id, band, sig) enters the bucket join; shingle arrays are
    * re-attached to the (tiny) verified candidate set afterwards. */
  def minhashLsh(docs: DataFrame, threshold: Double = 0.8): DataFrame = {
    val shl = shingled(docs).select("doc_id", "shingles")
      .filter(size(col("shingles")) > 0).persist()
    val sigs = signatures(shl).persist()
    val bands = bandsOf(sigs)
    val cand = bands.as("a")
      .join(bands.as("b"), Seq("band", "sig"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    cand
      .join(shl.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a")), "doc_a")
      .join(shl.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b")), "doc_b")
      .withColumn("jaccard",
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Duplicate-cluster resolution: connected components over near-dup
    * pairs by min-label propagation, yielding one canonical doc per
    * cluster (the keep-list step every dedup pipeline runs after pair
    * detection). Deterministic: the unique fixpoint labels every doc
    * with its component's minimum doc_id.
    *
    * Scale: each iteration is one join + one min-aggregate over the
    * edge list, and iterations = graph diameter — near-dup clusters are
    * shallow (pairwise-similar docs), so a handful of rounds converge.
    * The loop ALWAYS runs to convergence (min-label propagation
    * strictly decreases some label each non-final round, so it
    * terminates in ≤ diameter rounds): returning partial labels on a
    * long chain would silently split one component into several.
    * `maxIter` is a soft advisory bound — past it a warning is logged
    * per extra round (the signal to switch to the alternating
    * large-star/small-star CC algorithm, same per-round plan shape).
    * The per-round `count()` is the convergence check of every
    * iterative distributed CC (GraphX does the same), not a data
    * collect. */
  /** Round barrier for the iterative CC algorithms: truncates lineage
    * and materializes the round. Local-mode default is
    * `localCheckpoint` — executor-memory blocks, NOT replicated, so an
    * executor loss mid-iteration fails the job unrecoverably. A
    * cluster deployment that needs executor-loss tolerance sets
    * `spark.graft.cc.reliableCheckpoint=true` AND a
    * `SparkContext.setCheckpointDir`: rounds then checkpoint to
    * reliable storage — same algorithm, same labels (spec-pinned by
    * CcCheckpointSpec). Checkpoint files follow the session's
    * checkpoint-cleanup policy
    * (`spark.cleaner.referenceTracking.cleanCheckpoints`). */
  private def barrier(df: DataFrame): DataFrame = {
    val ss = df.sparkSession
    val reliable = ss.conf
      .getOption("spark.graft.cc.reliableCheckpoint")
      .exists(_.toBoolean) &&
      ss.sparkContext.getCheckpointDir.isDefined
    if (reliable) df.checkpoint() else df.localCheckpoint()
  }

  def clusters(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    // symmetric edge list via ONE explode projection — a union of two
    // selects over `pairs` would execute the (expensive: inverted-index
    // join / LSH verify) pairs subtree once per union branch; explode
    // emits both orientations from a single evaluation
    val edges = pairs
      .select(explode(array(
        struct(col("doc_a").as("v"), col("doc_b").as("u")),
        struct(col("doc_b").as("v"), col("doc_a").as("u")))).as("_e"))
      .select(col("_e.v").as("v"), col("_e.u").as("u"))
      .persist()
    // Each round references the previous labels TWICE, so the logical
    // plan doubles per iteration without a lineage barrier (2^n plan
    // nodes by round n — analyzer OOM). localCheckpoint materializes
    // the round and truncates lineage; a cluster deployment uses a
    // reliable checkpoint dir, same algorithm.
    var labels = barrier(edges.select("v").distinct()
      .withColumn("label", col("v")))
    var changed = 1L
    var i = 0
    while (changed > 0) {
      if (i >= maxIter)
        org.apache.log4j.Logger.getLogger(getClass)
          .warn(s"Dedup.clusters round ${i + 1} exceeds maxIter=$maxIter " +
            "(component diameter larger than expected); continuing to " +
            "convergence — consider large-star/small-star CC for this graph")
      val viaNeighbors = edges
        .join(labels.withColumnsRenamed(Map("v" -> "u", "label" -> "nl")), "u")
        .groupBy("v").agg(min("nl").as("min_nl"))
      // change flag computed in the same pass and checkpointed with the
      // labels: convergence detection is then a filter over the
      // materialized round, not an extra join+shuffle job
      val next = barrier(labels.join(viaNeighbors, Seq("v"), "left")
        .select(col("v"),
          least(col("label"), coalesce(col("min_nl"), col("label"))).as("label"),
          (coalesce(col("min_nl"), col("label")) < col("label")).as("chg")))
      changed = next.filter(col("chg")).count()
      labels = next.select("v", "label")
      i += 1
    }
    edges.unpersist()
    labels.select(col("v").as("doc_id"), col("label").as("cluster_id"),
      (col("v") === col("label")).as("is_canonical"))
  }

  /** Connected components by alternating large-star / small-star
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC'14) — the deep-graph alternative to [[clusters]]' min-label
    * propagation. Label propagation needs O(diameter) rounds; the star
    * operations contract whole subtrees onto component minima and
    * converge in O(log²) rounds even on long-chain graphs, which is
    * what you want when the dup graph is not shallow (e.g. chained
    * near-dups across a crawl). Output is identical to [[clusters]]:
    * every doc labeled with its component's minimum id.
    *
    * Per round: large-star = one groupBy on the symmetric adjacency +
    * one key-co-partitioned join; small-star the same on the downward
    * orientation — two shuffles per round, edge-count bounded by the
    * input (stars only ever re-point edges, never multiply them).
    * Rounds are lineage-truncated with localCheckpoint like
    * [[clusters]]; the convergence probe is a set-equality check
    * (anti-join count) over the materialized round. */
  def clustersTwoStar(pairs: DataFrame, maxIter: Int = 30): DataFrame = {
    // Materialize the narrow pair projection ONCE: verts and edges both
    // derive from it, and without the barrier each would re-execute the
    // (expensive) pairs subtree — three evaluations total counting both
    // union branches of the old verts build.
    val pe = barrier(pairs.select(col("doc_a"), col("doc_b")))
    val verts = barrier(pe
      .select(explode(array(col("doc_a"), col("doc_b"))).as("v"))
      .distinct())
    // canonical downward orientation (u > v), self-loops dropped
    var edges = barrier(pe
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
      .filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("u"),
        least(col("a"), col("b")).as("v"))
      .distinct())
    var converged = edges.isEmpty
    // |edges| carried across rounds: round N's |next| IS round N+1's
    // |edges|, so the fixed-point probe pays one count job, not two
    var edgeCount = -1L
    var i = 0
    while (!converged) {
      if (i >= maxIter)
        org.apache.log4j.Logger.getLogger(getClass)
          .warn(s"Dedup.clustersTwoStar round ${i + 1} exceeds maxIter=" +
            s"$maxIter; continuing to convergence")
      // large-star: every neighbor v > u re-points to
      // min(Γ(u) ∪ {u}); emitted edges stay downward (v > u ≥ m)
      val adj = edges.unionByName(
        edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = adj.groupBy("u").agg(least(min("v"), col("u")).as("m"))
      // the large-star output feeds BOTH small-star consumers (the min
      // aggregate and the re-point join) — persist it for the round so
      // its groupBy+join+distinct chain runs once, not twice
      val ls = adj.filter(col("v") > col("u")).join(lsMin, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct().persist()
      // small-star: on the downward orientation, every lesser
      // neighbor (and u itself) re-points to min(Γ⁻(u) ∪ {u})
      val ssMin = ls.groupBy("u").agg(least(min("v"), col("u")).as("m"))
      val joined = ls.join(ssMin, "u")
      val next = barrier(joined.filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionByName(ssMin.filter(col("u") =!= col("m"))
          .select(col("u"), col("m").as("v")))
        .distinct()) // eager barrier: ls consumed, safe to drop
      ls.unpersist()
      // fixed point: next ⊆ edges ∧ |next| = |edges| ⇒ equal sets
      val nextCount = next.count()
      if (edgeCount < 0L) edgeCount = edges.count()
      converged = nextCount == edgeCount &&
        next.join(edges, Seq("u", "v"), "left_anti").isEmpty
      edgeCount = nextCount
      edges = next
      i += 1
    }
    // fixed point is a star forest: (child, component-min) edges
    verts
      .join(edges.select(col("u").as("v"), col("v").as("label")), Seq("v"), "left")
      .select(col("v").as("doc_id"),
        coalesce(col("label"), col("v")).as("cluster_id"),
        (col("v") === coalesce(col("label"), col("v"))).as("is_canonical"))
  }

  /** Duplicate-cluster size distribution — the curation report on top
    * of [[clusters]]: how many clusters of each size exist and how many
    * documents they hold (docs − clusters = removable duplicates). Two
    * tiny shuffles over the already-reduced label table; exact integer
    * counts on both engines. */
  def clusterStats(clusters: DataFrame): DataFrame =
    clusters
      .groupBy("cluster_id").agg(count(lit(1)).as("cluster_size"))
      .groupBy("cluster_size").agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("cluster_size") * col("n_clusters"))

  /** Per-doc 60-bit SimHash fingerprint over distinct-word hashes.
    * The word-hash array is persisted before the 60-bit fold: the fold
    * references `hs` once per bit, and without the barrier projection
    * collapse would re-evaluate the md5 word hashing 60× per doc. */
  def simhashFingerprints(docs: DataFrame): DataFrame = {
    val sid = Hashing.sid60Spark("s")
    val hashed = docs
      .withColumn("words",
        array_distinct(split(trim(lower(col("text"))), "\\s+")))
      .filter(size(col("words")) > 0)
      .withColumn("hs", expr(s"transform(words, s -> $sid)"))
      .select("doc_id", "hs").persist()
    val spark = hashed.sparkSession
    if (!spark.sessionState.functionRegistry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier(
          graft.functions.SimhashFingerprint.name)))
      graft.functions.SimhashFingerprint.register(spark)
    hashed
      .withColumn("fp",
        graft.functions.SimhashFingerprint.fingerprint(col("hs")))
      .select("doc_id", "fp")
  }

  /** SimHash near-dup pairs: 4×15-bit band bucket join, Hamming ≤ 3.
    * Fingerprints are persisted before banding (same projection-collapse
    * hazard as minhashLsh — the 60·|words|-op fingerprint expression
    * would otherwise re-evaluate per band and per join side). */
  def simhash(docs: DataFrame): DataFrame = {
    val fps = simhashFingerprints(docs).persist()
    val bands = fps.select(col("doc_id"), col("fp"),
      expr(s"explode(transform(sequence(0, ${Hashing.SimhashBands - 1}), " +
        s"k -> struct(k as band, shiftright(fp, k * ${Hashing.SimhashBandBits}) & " +
        s"${(1L << Hashing.SimhashBandBits) - 1}L as bval)))").as("e"))
      .select(col("doc_id"), col("fp"), col("e.band"), col("e.bval"))
    bands.as("a").join(bands.as("b"), Seq("band", "bval"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fp").as("fp_a"), col("b.fp").as("fp_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", expr("cast(bit_count(fp_a ^ fp_b) as int)"))
      .filter(col("hamming") <= Hashing.SimhashMaxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Exact SUBSTRING dedup at token granularity — the Lee et al. 2022
    * ("Deduplicating Training Data Makes Language Models Better")
    * ExactSubstr standard that whole-chunk hashing approximates: a
    * duplicated passage that straddles or shifts across chunk
    * boundaries is invisible to [[ChunkDedup]]'s aligned paragraph/
    * chunk hashes, but a stride-1 sliding window catches it at any
    * offset.
    *
    * Every `window`-token window (stride 1) of every document is
    * hashed (md5 of the space-joined tokens — the engines' shared
    * collision-free bridge; docs shorter than `window` contribute no
    * windows and are whole-doc dedup's job). A window occurrence that
    * is not its hash group's earliest (in doc_id·ChunkIdSpace+pos
    * order) is a duplicated window; overlapping-or-adjacent duplicated
    * windows in a doc merge into maximal removal spans
    * `[span_start, span_end)` in token offsets — the span shape
    * curation applies (cut the span, keep the canonical occurrence).
    *
    * Scale: NO self-join and no candidate blowup — occurrence counts
    * and canonical keys come from `groupBy(wh).agg(count, min)` joined
    * back on `wh`, NOT a window over the hash: map-side partial
    * aggregation absorbs a hot boilerplate hash (a license paragraph
    * occurring in 10⁷ docs folds to one row per map task before the
    * shuffle), and the equi-join back gets AQE skew-splitting — the
    * two reliefs a `Window.partitionBy(wh)` plan can never have. Both
    * consumers shuffle the same hashed child on `wh`, so exchange
    * reuse materializes the stride-1 hashing once; the island merge
    * then rides a doc_id window (duplicated windows only). The
    * stride-1 hashing itself is shuffle-free but re-materializes each
    * window's text once (O(window · corpus_tokens) bytes hashed — the
    * constant-factor price of windowed hashing vs a suffix array,
    * which has no distributed shape; raise `window`/use [[ChunkDedup]]
    * for a cheaper aligned prefilter). */
  def exactSubstring(docs: DataFrame, window: Int = 20): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    val key = col("doc_id") * ChunkDedup.ChunkIdSpace + col("i")
    val hashed = windowHashes(docs, window)
    val dupStats = hashed.groupBy("wh")
      .agg(count(lit(1)).as("cnt"), min(key).as("canon_key"))
      .filter(col("cnt") > 1)
    val dups = hashed.join(dupStats, Seq("wh"))
      .filter(key =!= col("canon_key"))
      .select("doc_id", "i")
    mergeSpans(dups, window)
  }

  /** `(doc_id, i, wh)` — every `window`-token window at stride 1, with
    * its md5 hash ([[exactSubstring]]'s hashing, shared with the
    * batch-over-store path).
    *
    * Valve: occurrence keys pack token positions as
    * `doc_id·ChunkIdSpace + i`, so a document with ≥ ChunkIdSpace
    * (10⁷) tokens would silently collide into a neighbouring doc's key
    * space, corrupting canonical selection and the store's replay
    * exemption — refuse loudly instead (the repo's valve discipline;
    * split such a document upstream). */
  private def windowHashes(docs: DataFrame, window: Int): DataFrame =
    docs
      // null text contributes no windows (it must not reach the valve:
      // size(NULL) is NULL, which would fall through when() into
      // raise_error with a misleading too-many-tokens message)
      .filter(col("text").isNotNull)
      .select(col("doc_id"), split(trim(lower(col("text"))), "\\s+").as("w"))
      .withColumn("n",
        when(size(col("w")) < lit(ChunkDedup.ChunkIdSpace),
          size(col("w")).cast("bigint"))
          .otherwise(raise_error(concat(
            lit("exactSubstring: document "), col("doc_id"),
            lit(s" has >= ${ChunkDedup.ChunkIdSpace} tokens — packed " +
              "doc_id*ChunkIdSpace+pos keys would collide; split the " +
              "document upstream")))))
      .filter(col("n") >= window)
      .withColumn("i", explode(sequence(lit(0L), col("n") - window)))
      .select(col("doc_id"), col("i"),
        md5(array_join(
          slice(col("w"), (col("i") + 1).cast("int"), lit(window)),
          " ").cast("binary")).as("wh"))

  /** Island-merge duplicated window positions `(doc_id, i [,
    * matched_store])` into maximal removal spans: same span iff the
    * next window starts within `window` of the previous (overlap or
    * adjacency). One doc_id-window shuffle; the span rollup rides it. */
  private def mergeSpans(dups: DataFrame, window: Int): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val byDoc = W.partitionBy("doc_id").orderBy("i")
    val withFlag = dups.columns.contains("matched_store")
    val aggs =
      Seq(min(col("i")).as("span_start"),
        (max(col("i")) + window).as("span_end"),
        count(lit(1)).as("n_windows")) ++
        (if (withFlag) Seq(max(col("matched_store")).as("matched_store"))
         else Nil)
    dups
      .withColumn("new_span",
        when(lag(col("i"), 1).over(byDoc).isNull ||
          col("i") > lag(col("i"), 1).over(byDoc) + window, 1L)
          .otherwise(0L))
      .withColumn("span_id", sum(col("new_span")).over(
        byDoc.rowsBetween(W.unboundedPreceding, W.currentRow)))
      .groupBy(col("doc_id"), col("span_id"))
      .agg(aggs.head, aggs.tail: _*)
      .drop("span_id")
  }

  /** APPLY removal spans — the cut half of the Lee et al. ExactSubstr
    * flow ([[exactSubstring]] detects, this removes): drop every token
    * whose position falls inside one of the doc's `[span_start,
    * span_end)` spans and rebuild the text from the survivors.
    * Documents without spans pass through (rebuilt from their own
    * tokens, so BOTH cases carry the same whitespace normalization —
    * runs of whitespace collapse to single spaces; original casing is
    * preserved, the spans' offsets are tokenization-position-only).
    *
    * Scale: one shuffle co-partitions the tiny span list with the
    * corpus on doc_id; the cut itself is a shuffle-free higher-order
    * projection (per-token span check is O(spans-per-doc), a handful). */
  def cutSpans(docs: DataFrame, spans: DataFrame): DataFrame = {
    val byDoc = spans.groupBy("doc_id").agg(
      collect_list(struct(col("span_start"), col("span_end"))).as("_sp"))
    val kept = "filter(_w, (t, i) -> NOT coalesce(" +
      "exists(_sp, s -> i >= s.span_start AND i < s.span_end), false))"
    docs.join(byDoc, Seq("doc_id"), "left")
      .withColumn("_w", split(trim(col("text")), "\\s+"))
      .select(col("doc_id"),
        expr(s"array_join($kept, ' ')").as("clean_text"),
        expr(s"cast(size(_w) - size($kept) as bigint)").as("n_removed"))
  }

  /** The current substring-store content `(wh, canon_key)` — empty
    * frame before the first batch.
    *
    * Defensively folds to one canonical per hash (`groupBy(wh).agg(
    * min(canon_key))`): should two writers ever race the single-writer
    * contract (see [[exactSubstringBatch]]) and both append a
    * canonical for the same hash, the fold keeps the earliest and the
    * replay check stays sound. Nearly free — the fold's output is
    * already hash-partitioned on `wh`, exactly the partitioning the
    * batch join needs, so no extra shuffle materializes. */
  def readSubstringStore(spark: org.apache.spark.sql.SparkSession,
                         storeRoot: String): DataFrame =
    if (SnapshotTable.latestVersion(storeRoot) >= 0)
      SnapshotTable.read(spark, storeRoot)
        .groupBy("wh").agg(min(col("canon_key")).as("canon_key"))
    else {
      import spark.implicits._
      Seq.empty[(String, Long)].toDF("wh", "canon_key")
    }

  /** [[exactSubstring]] against a persisted cross-batch store — the
    * production ExactSubstr flow (Lee et al. 2022: dedup each new
    * crawl snapshot against the whole corpus WITHOUT rescanning it):
    * the batch's stride-1 window hashes left-join the store's
    * canonical hashes (O(batch) rows through the join; the store side
    * is partition-bucketed by hash), a window is duplicated when an
    * EARLIER batch holds its hash or an earlier occurrence in THIS
    * batch does, and hashes nobody has seen fast-append as new
    * canonicals in one atomic commit. A replayed batch matches only
    * itself (its canonical keys equal the store rows it wrote) and
    * appends nothing.
    *
    * PRECONDITION: `doc_id`s are unique ACROSS batches (the same
    * contract as [[IncrementalDedup]] — the store records canonical
    * occurrences as packed `doc_id·ChunkIdSpace+pos` keys, so a later
    * batch reusing an earlier batch's doc_id both corrupts the
    * canonical references and defeats the replay check, which exempts
    * a window exactly when its own packed key IS the store row).
    *
    * SINGLE-WRITER contract (the [[IncrementalDedup]] contract): one
    * batch at a time appends to `storeRoot`. Two concurrent batches
    * that both miss a hash would both append a canonical for it;
    * [[readSubstringStore]] folds such twins defensively (earliest
    * key wins) so later reads stay sound, but the losing batch's
    * verdicts for that hash are already emitted — serialize writers
    * (e.g. via [[CurationRun]]'s catalog commit) rather than rely on
    * the fold.
    *
    * Returns the merged removal spans (the [[exactSubstring]]
    * contract) plus `matched_store` — true when the span's canonical
    * lives in an earlier batch. Store size is one row per distinct
    * window hash in the corpus — the inherent ExactSubstr index cost
    * (a suffix array is corpus-sized too); it rides the snapshot
    * store's compaction/expiry maintenance like every other store. */
  def exactSubstringBatch(spark: org.apache.spark.sql.SparkSession,
                          storeRoot: String, docs: DataFrame,
                          window: Int = 20): DataFrame = {
    val store = readSubstringStore(spark, storeRoot)
    val (spans, newCanon, cache) = exactSubstringStage(docs, store, window)
    try {
      if (!newCanon.isEmpty)
        SnapshotTable.commitAppend(newCanon, storeRoot, "wh_bucket")
      spans
    } finally cache.unpersist()
  }

  /** The stage-only core of [[exactSubstringBatch]]: dedup `docs`
    * against an ALREADY-READ store content frame `(wh, canon_key)` and
    * return `(spans, newCanon, cache)` WITHOUT writing anything — what
    * lets [[CurationRun]] stage the store append and publish it
    * atomically with the corpus. `spans` is eagerly materialized;
    * `newCanon` (`wh, canon_key, wh_bucket` — partition by
    * `wh_bucket`) must be consumed before `cache.unpersist()`. */
  private[graft] def exactSubstringStage(docs: DataFrame, store: DataFrame,
                                         window: Int)
      : (DataFrame, DataFrame, DataFrame) = {
    require(window >= 2, s"window must be >= 2, got $window")
    val key = col("doc_id") * ChunkDedup.ChunkIdSpace + col("i")
    val hashed = windowHashes(docs, window)
    // Same skew-safe shape as [[exactSubstring]]: per-hash stats via
    // groupBy (map-side partials absorb a hot boilerplate hash) joined
    // back on wh (AQE skew-split applies), never a window over wh.
    val batchStats = hashed.groupBy("wh")
      .agg(count(lit(1)).as("cnt"), min(key).as("batch_canon"))
    val joined = hashed
      .join(batchStats, Seq("wh"))
      .join(store.withColumnRenamed("canon_key", "store_canon"),
        Seq("wh"), "left")
      .persist()
    val isDup =
      (col("store_canon").isNotNull && key =!= col("store_canon")) ||
        (col("store_canon").isNull && col("cnt") > 1 &&
          key =!= col("batch_canon"))
    val dups = joined.filter(isDup)
      .select(col("doc_id"), col("i"),
        (col("store_canon").isNotNull &&
          col("store_canon") =!= col("batch_canon"))
          .as("matched_store"))
    val spans = mergeSpans(dups, window)
      .select("doc_id", "span_start", "span_end", "n_windows",
        "matched_store")
      .localCheckpoint(eager = true)
    // batchStats already holds one row per distinct hash with its
    // earliest key — no second aggregate over the occurrences.
    val newCanon = joined
      .filter(col("store_canon").isNull)
      .select(col("wh"), col("batch_canon").as("canon_key"))
      .dropDuplicates("wh")
      .withColumn("wh_bucket", pmod(xxhash64(col("wh")), lit(16L)))
    (spans, newCanon, joined)
  }
}
