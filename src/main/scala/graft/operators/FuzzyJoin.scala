package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed FUZZY (edit-distance) join — the entity-resolution /
  * data-cleaning operator (matching near-identical names, symbols,
  * titles across feeds) WITHOUT the all-pairs cross join a naive
  * `levenshtein(a,b) <= d` theta join plans.
  *
  * Candidate generation is a q-gram inverted index (Gravano et al.,
  * approximate string joins) with the Ed-Join PREFIX FILTER (Xiao,
  * Wang & Lin 2008): a pair within `maxDist` edits whose longer
  * string has ≥ q·(1+maxDist) characters must share at least one
  * q-gram (each edit destroys at most q of the longer side's
  * max(|a|,|b|)−q+1 grams, so shared ≥ max+1−q−d·q ≥ 1) — and,
  * sharper, d edits can eliminate at most d·q DISTINCT gram values
  * from a string (a value vanishes only when every occurrence
  * overlaps an edit, and each edit overlaps ≤ q gram positions), so
  * ANY d·q+1 distinct grams of the left value contain at least one
  * that survives verbatim in the right value. The join therefore
  * probes only each left value's SIGNATURE — its d·q+1 grams with
  * the LOWEST global document frequency — against the right side's
  * full gram inventory: complete by the survival bound, and a HOT
  * gram (a common substring shared by a large fraction of the
  * inventory — "ing"/"tion" in real catalogs) is precisely the gram
  * the rarest-first signature never picks, collapsing the hot-gram
  * candidate quadratic (Σ_g df²) to near-linear Σ_g sigdf·df. Pairs
  * short enough to evade the bound live in the "short strings"
  * bucket (both sides ≤ q·(1+maxDist)−1 chars — for q=3, d=2 that is
  * ≤ 8 chars), which is ITSELF indexed, never crossed: the same
  * theorem at q=1 makes a POSITIONAL 1-gram equi-join (shared char
  * with |Δpos| ≤ maxDist — Gravano's position filter) complete for
  * every short pair whose longer side exceeds maxDist chars, and the
  * residue — both sides ≤ maxDist chars, e.g. ≤ 2-char codes at
  * d=2 — is the only cross join left, bounded by the charset, not
  * the inventory. A length-difference ≤ maxDist filter prunes
  * candidates before the exact `levenshtein` verify, which runs on
  * candidates only. The signature engages by MEASURED work: one
  * aggregate over the gram index prices the plain equi-join's exact
  * candidate count, and under `maxGramCandidates` (default 25M) the
  * plain join runs instead — its fixed three extra shuffle stages
  * dominate at small inventories where the quadratic cannot hurt.
  *
  * Scale shape: work is O(Σ per-gram signature·full pair counts)
  * like the shingle dedup family — never |L|·|R|; values are
  * DEDUPLICATED before the quadratic stage (match distinct values,
  * join rows back by equality), the classic entity-resolution
  * layout. The signature kills the hot-gram quadratic (measured at
  * 100×: candidate pairs through shared-substring grams grow
  * 12000× without it, linearly with it); residual hot signature
  * grams are still equi-join keys, so AQE skew-split applies. A
  * pathological SHORT-string inventory
  * (millions of distinct ticker/SKU-length codes, where the 1-gram
  * index is inherently dense) REFUSES loudly past
  * `maxShortCandidates` instead of exploding — raise the cap
  * deliberately for a run that truly wants the quadratic.
  *
  * Caching: the deduplicated value sets are persisted (each feeds the
  * gram join AND the short bucket) and, as everywhere in the dedup
  * family, ownership passes to the caller — drop them with
  * `spark.catalog.clearCache()` between unrelated jobs. */
object FuzzyJoin {

  /** Distinct q-grams of a string column (strings shorter than q have
    * none — the short bucket covers them). */
  private def grams(c: String, q: Int): Column =
    expr(s"if(length($c) >= $q, array_distinct(transform(" +
      s"sequence(1, length($c) - $q + 1), i -> substring($c, i, $q)))" +
      ", array())")

  /** Positional 1-grams of a string column: (char, position) rows. */
  private def posGrams(c: String): Column =
    expr(s"transform(sequence(1, length($c)), " +
      s"i -> named_struct('g', substring($c, i, 1), 'p', i))")

  /** Matching VALUE pairs across two string columns: (a, b, dist)
    * with dist = levenshtein ≤ `maxDist`, over the DISTINCT non-null
    * values of each side. Join rows back on value equality.
    * `maxShortCandidates` is the short-bucket valve: the run refuses
    * (IllegalArgumentException naming the knob) when the ≤-8-char
    * inventory's 1-gram index would enumerate more candidate pairs
    * than this — the quadratic a caller must opt into, never fall
    * into. */
  def matches(left: DataFrame, lCol: String, right: DataFrame,
              rCol: String, maxDist: Int, q: Int = 3,
              maxShortCandidates: Long = 100000000L,
              maxGramCandidates: Long = 25000000L): DataFrame =
    matchesPlanned(left, lCol, right, rCol, maxDist, q,
      maxShortCandidates, maxGramCandidates, stored = None, self = false)

  /** Pre-recorded candidate-work estimates for one fuzzy-join config —
    * what [[collectGramStats]] persists for a stored table column so
    * [[selfPairsStored]] runs ZERO pricing jobs: every plan gate
    * answers from these scalars and the signature build joins the
    * recorded gram-df frame (ONE join) instead of aggregating the
    * gram index twice. The ranking frame affects PERFORMANCE only —
    * any fixed gram ranking preserves completeness (the d·q+1
    * survival bound), so a recorded ranking is always safe to use. */
  private[graft] final case class GramEstimates(
      pairCount: Double, gramCandidates: Double,
      shortGramCandidates: Double, tinyPairs: Double, shortPairs: Double,
      gramDf: Option[() => DataFrame])

  /** Spark actions run purely to PRICE a fuzzy-join plan (inventory
    * counts, gram-candidate and short-bucket estimates) — stays 0
    * when stored [[GramEstimates]] answered every gate. Test/audit
    * hook, the commitDataScans pattern. */
  private[graft] val pricingJobs =
    new java.util.concurrent.atomic.AtomicLong

  /** `self = true` declares left and right to be the SAME table/column
    * (the [[selfPairs]] family): every right-side frame then derives by
    * column rename from the left-side PERSISTED one — one distinct
    * value cache, one gram explode/repartition cache and one df
    * aggregate instead of two of each, and the pricing scalars collapse
    * to their single-side forms (n², Σ df² — numerically IDENTICAL to
    * the two-sided Σ df_l·df_r when both sides are the same frame, so
    * every plan gate fires exactly as before). Candidates, ranking
    * order and the final verified pairs are unchanged — the right side
    * is literally the same rows. */
  private def matchesPlanned(left: DataFrame, lCol: String,
                             right: DataFrame, rCol: String,
                             maxDist: Int, q: Int,
                             maxShortCandidates: Long,
                             maxGramCandidates: Long,
                             stored: Option[GramEstimates],
                             self: Boolean): DataFrame = {
    require(maxDist >= 0 && q >= 2, "need maxDist >= 0 and q >= 2")
    val l = left.select(col(lCol).cast("string").as("a"))
      .filter(col("a").isNotNull).distinct().persist()
    val r =
      if (self) l.select(col("a").as("b"))
      else right.select(col(rCol).cast("string").as("b"))
        .filter(col("b").isNotNull).distinct().persist()
    val lg = l.select(col("a"), explode(grams("a", q)).as("_g"))
    val rg = r.select(col("b"), explode(grams("b", q)).as("_g"))
    // Plan the long path by MEASURED work, like the short bucket: the
    // plain gram equi-join enumerates exactly Σ_g df_l(g)·df_r(g)
    // candidates (one aggregate over the gram index — its shuffle is
    // reused by whichever join shape runs). Under `maxGramCandidates`
    // the plain join is cheaper than building signatures (three fixed
    // shuffle stages that dominate at small inventories); past it the
    // Ed-Join signature engages.
    // free pre-gate first: when even the full |L|·|R| cross product is
    // under budget, no gram distribution can push the equi-join past
    // it — skip the pricing job (ONE action over the tiny persisted
    // value frames)
    // All candidate estimates are priced in DOUBLE: at the hot-gram
    // scales the gate exists for, Σ df_l·df_r overflows Long — under
    // ANSI mode the sum would throw, and a silent wrap would go
    // NEGATIVE and pass the <= gate, routing the plain quadratic join
    // exactly when it is catastrophic. Double loses precision only
    // past 2^53 candidates, ~8 orders of magnitude beyond any gate
    // anyone would set, and degrades toward +inf, never negative.
    val smallInventory = stored match {
      case Some(e) => e.pairCount <= maxGramCandidates.toDouble
      case None if self =>
        pricingJobs.incrementAndGet()
        val n = l.count().toDouble // also materializes the shared cache
        n * n <= maxGramCandidates.toDouble
      case None =>
        pricingJobs.incrementAndGet()
        val c = l.agg(count(lit(1)).as("nl"))
          .crossJoin(r.agg(count(lit(1)).as("nr"))).head()
        c.getLong(0).toDouble * c.getLong(1).toDouble <=
          maxGramCandidates.toDouble
    }
    // When the pricing aggregate must RUN (no stored estimates, big
    // inventory), persist the gram frames REPARTITIONED by gram: the
    // pricing and the subsequent join shuffle the same rows by the
    // same key, but as separate ACTIONS Spark cannot reuse the
    // exchange across them — caching the partitioned frames pays the
    // explode+shuffle once (this was the whole bench premium of the
    // measured gate). Cache ownership passes to the caller, like the
    // value frames above.
    val (lgJ, rgJ) =
      if (stored.isEmpty && !smallInventory) {
        val lj = lg.repartition(col("_g")).persist()
        // self: ONE repartitioned gram cache serves both join sides (a
        // rename projection over the persisted frame is a cache hit)
        (lj,
          if (self) lj.select(col("a").as("b"), col("_g"))
          else rg.repartition(col("_g")).persist())
      } else (lg, if (self) lg.select(col("a").as("b"), col("_g")) else rg)
    lazy val ldf = lgJ.groupBy("_g").agg(count(lit(1)).as("_cl"))
    lazy val rdf = rgJ.groupBy("_g").agg(count(lit(1)).as("_cr"))
    lazy val candEst = stored match {
      case Some(e) => e.gramCandidates
      case None if self =>
        // Σ_g df² off ONE gram aggregate (df_l ≡ df_r here)
        pricingJobs.incrementAndGet()
        ldf.agg(coalesce(sum(col("_cl").cast("double") *
          col("_cl").cast("double")), lit(0.0d))).head().getDouble(0)
      case None =>
        pricingJobs.incrementAndGet()
        ldf.join(rdf, "_g")
          .agg(coalesce(sum(col("_cl").cast("double") *
            col("_cr").cast("double")), lit(0.0d)))
          .head().getDouble(0)
    }
    val byGram =
      if (smallInventory || candEst <= maxGramCandidates.toDouble)
        lgJ.join(rgJ, "_g").select("a", "b")
      else {
        // Ed-Join prefix signature: each left value probes only its
        // d·q+1 rarest grams (global df over both sides — any fixed
        // ranking preserves completeness; rarest-first minimizes work
        // and drops hot grams from every signature). Values with
        // fewer distinct grams keep them all — the survival bound
        // then degenerates to the full-gram join for those values.
        // A stored ranking frame replaces the two df aggregates with
        // one sidecar read — and stays COMPLETE even if stale (the
        // ranking is a performance choice, never a correctness one).
        val sigSize = maxDist * q + 1
        // self: df_l ≡ df_r, so the single-side aggregate ranks grams in
        // exactly the order the two-sided sum would (2·df preserves both
        // order and ties under the (_df, _g) sort) — one aggregate, no
        // full_outer self-join
        val gramDf = stored.flatMap(_.gramDf).map(_())
          .getOrElse(
            if (self) ldf.select(col("_g"), col("_cl").as("_df"))
            else ldf.join(rdf, Seq("_g"), "full_outer")
              .select(col("_g"),
                (coalesce(col("_cl"), lit(0L)) +
                  coalesce(col("_cr"), lit(0L))).as("_df")))
        val byA = org.apache.spark.sql.expressions.Window
          .partitionBy("a").orderBy(col("_df"), col("_g"))
        // LEFT join: a gram absent from the ranking frame (a stale
        // stored frame) must not drop a value's signature — absent
        // means rare, df 0, ranked first; completeness never depends
        // on the frame's coverage
        val lSig = lgJ.join(gramDf, Seq("_g"), "left")
          .withColumn("_df", coalesce(col("_df"), lit(0L)))
          .withColumn("_rk", row_number().over(byA))
          .filter(col("_rk") <= sigSize)
          .select("a", "_g")
        lSig.join(rgJ, "_g").select("a", "b")
      }
    // the short bucket: pairs the q-gram bound cannot promise — both
    // sides under q(1+d) chars. Indexed by POSITIONAL 1-grams (the
    // q=1 instance of the same bound: the longer side's ≥ max−d
    // surviving chars shift by at most d positions), complete for
    // max(|a|,|b|) > maxDist.
    val cap = q * (1 + maxDist) - 1
    val lShort = l.filter(length(col("a")) <= cap)
    val rShort = r.filter(length(col("b")) <= cap)
    val lg1 = lShort.select(col("a"), explode(posGrams("a")).as("gp"))
      .select(col("a"), col("gp.g").as("_gl"), col("gp.p").as("_pl"))
    val rg1 = rShort.select(col("b"), explode(posGrams("b")).as("gp"))
      .select(col("b"), col("gp.g").as("_gr"), col("gp.p").as("_pr"))
    // Plan the short bucket by MEASURED work, not hope: the 1-gram
    // equi-join enumerates exactly Σ_g df_l(g)·df_r(g) candidate
    // pairs (one tiny aggregate over the bucket), the cross join
    // |L_short|·|R_short|. Sparse real-world inventories (few short
    // values, or clustered ones sharing rare chars) make the index
    // cheap; tiny-alphabet inventories make it DENSER than the cross
    // — pick the cheaper complete strategy, and when both blow the
    // budget refuse loudly: short-string matching over a dense
    // inventory is inherently quadratic, an opt-in, never a default.
    val gramEst = stored match {
      case Some(e) => e.shortGramCandidates
      case None if self =>
        pricingJobs.incrementAndGet()
        lg1.groupBy(col("_gl").as("g"))
          .agg(count(lit(1)).as("cl"))
          .agg(coalesce(sum(col("cl").cast("double") *
            col("cl").cast("double")), lit(0.0d))).head().getDouble(0)
      case None =>
        pricingJobs.incrementAndGet()
        lg1.groupBy(col("_gl").as("g"))
          .agg(count(lit(1)).as("cl"))
          .join(rg1.groupBy(col("_gr").as("g"))
            .agg(count(lit(1)).as("cr")), "g")
          .agg(coalesce(sum(col("cl").cast("double") *
            col("cr").cast("double")), lit(0.0d))).head().getDouble(0)
    }
    // the index path ALSO pays the ≤maxDist-char residue cross join
    // (values too short for even one 1-gram) — measure it into the
    // budget, or a dense tiny-value inventory slips past the valve
    val tinyEst = stored match {
      case Some(e) => e.tinyPairs
      case None if self =>
        pricingJobs.incrementAndGet()
        val t = l.filter(length(col("a")) <= maxDist).count().toDouble
        t * t
      case None =>
        pricingJobs.incrementAndGet()
        l.filter(length(col("a")) <= maxDist).count().toDouble *
          r.filter(length(col("b")) <= maxDist).count().toDouble
    }
    val indexEst = gramEst + tinyEst
    val crossEst = stored match {
      case Some(e) => e.shortPairs
      case None if self =>
        pricingJobs.incrementAndGet()
        val sct = lShort.count().toDouble
        sct * sct
      case None =>
        pricingJobs.incrementAndGet()
        lShort.count().toDouble * rShort.count().toDouble
    }
    require(math.min(indexEst, crossEst) <= maxShortCandidates.toDouble,
      s"fuzzy-join short bucket would enumerate ${math.min(indexEst,
        crossEst)} candidate pairs (> maxShortCandidates=" +
        s"$maxShortCandidates) under its cheaper strategy (1-gram " +
        s"index + tiny residue: $indexEst, cross: $crossEst): the " +
        s"≤$cap-char value inventory is dense enough that " +
        "short-string matching is inherently quadratic here — raise " +
        "maxShortCandidates to opt in")
    val shorts =
      if (indexEst <= crossEst) {
        val byGram1 = lg1.join(rg1,
          col("_gl") === col("_gr") &&
            abs(col("_pl") - col("_pr")) <= maxDist &&
            abs(length(col("a")) - length(col("b"))) <= maxDist)
          .select("a", "b")
        // the residue 1-grams cannot cover: BOTH sides ≤ maxDist
        // chars (includes empty strings, which have no grams at
        // all) — a cross join over sets bounded by the charset,
        // |Σ|^maxDist values at most, independent of inventory size
        val tiny = l.filter(length(col("a")) <= maxDist)
          .crossJoin(r.filter(length(col("b")) <= maxDist))
          .select("a", "b")
        byGram1.unionByName(tiny)
      } else lShort.crossJoin(rShort).select("a", "b")
    byGram.unionByName(shorts).distinct()
      .filter(abs(length(col("a")) - length(col("b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= maxDist)
  }

  /** Self fuzzy-join of one string column's distinct values: pairs
    * (a < b, dist ≤ maxDist) — the near-duplicate-values report that
    * feeds entity canonicalization (compose with [[Dedup.clusters]]
    * for transitive groups). */
  def selfPairs(df: DataFrame, strCol: String, maxDist: Int,
                q: Int = 3,
                maxShortCandidates: Long = 100000000L,
                maxGramCandidates: Long = 25000000L): DataFrame =
    matchesPlanned(df, strCol, df, strCol, maxDist, q, maxShortCandidates,
      maxGramCandidates, stored = None, self = true)
      .filter(col("a") < col("b"))

  private def gramStatsDir(root: String, v: Long, column: String,
                           maxDist: Int, q: Int) =
    graft.operators.MetaIO.join(root, s"v=$v",
      s"_fuzzy_${column}_q${q}_d$maxDist")

  /** Record the GRAM-STATISTICS sidecar for a stored snapshot-table
    * column at one (q, maxDist) fuzzy-join config — the
    * [[SnapshotTable.collectNdv]] pattern applied to fuzzy joins
    * (VERDICT r14 #4): one scan over the column's distinct values
    * computes (a) the per-gram document-frequency frame (the
    * signature ranking, persisted as parquet) and (b) the four
    * candidate-work scalars every [[matches]] plan gate prices per
    * query today (|pairs|, Σ df², short-bucket Σ char-df², tiny and
    * short pair counts, self-join form). [[selfPairsStored]] then
    * answers every gate from this metadata and builds signatures with
    * ONE sidecar join — zero pricing jobs per query. Idempotent per
    * (version, column, q, d); the sidecar pins to the exact table
    * version it scanned (grams dir lands first, the scalars file —
    * what readers key on — last, so a half-written sidecar is
    * invisible). Returns the version covered. */
  def collectGramStats(spark: org.apache.spark.sql.SparkSession,
                       root: String, column: String, maxDist: Int,
                       q: Int = 3, version: Long = -1L): Long = {
    require(maxDist >= 0 && q >= 2, "need maxDist >= 0 and q >= 2")
    val v = if (version >= 0) version else SnapshotTable.latestVersion(root)
    require(v >= 0, s"no committed version at $root")
    val dir = gramStatsDir(root, v, column, maxDist, q)
    val scalars = MetaIO.join(dir.toString, "scalars")
    if (MetaIO.exists(scalars)) return v // idempotent
    val vals = SnapshotTable.read(spark, root, v)
      .select(col(column).cast("string").as("a"))
      .filter(col("a").isNotNull).distinct().persist()
    val n = vals.count().toDouble
    val tmp = MetaIO.join(root, s"v=$v",
      s".fuzzy.new-${java.util.UUID.randomUUID()}")
    vals.select(explode(grams("a", q)).as("_g"))
      .groupBy("_g").agg(count(lit(1)).as("_df"))
      .write.mode("overwrite").parquet(tmp.toString)
    val selfCand = spark.read.parquet(tmp.toString)
      .agg(coalesce(sum(col("_df").cast("double") *
        col("_df").cast("double")), lit(0.0d))).head().getDouble(0)
    val cap = q * (1 + maxDist) - 1
    val shortVals = vals.filter(length(col("a")) <= cap)
    val shortCount = shortVals.count().toDouble
    val tinyCount =
      vals.filter(length(col("a")) <= maxDist).count().toDouble
    val shortGramCand = shortVals
      .select(explode(posGrams("a")).as("gp"))
      .groupBy(col("gp.g")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c").cast("double") *
        col("c").cast("double")), lit(0.0d))).head().getDouble(0)
    vals.unpersist()
    val gramsDir = MetaIO.join(dir.toString, "grams")
    MetaIO.mkdirs(dir.toString)
    MetaIO.delete(gramsDir, recursive = true)
    MetaIO.moveTree(tmp, gramsDir)
    // publish, never plain-write: scalars is what readers key on, and
    // a crash mid-write would leave a truncated prefix that PARSES
    // (e.g. "short=1") — mispricing the very gates the sidecar exists
    // for, permanently (the exists() idempotence check would then skip
    // every rebuild). publishString appears atomically or not at all.
    MetaIO.publishString(scalars,
      s"n=$n\nselfCand=$selfCand\nshortGramCand=$shortGramCand\n" +
        s"tiny=$tinyCount\nshort=$shortCount")
    v
  }

  /** The recorded [[GramEstimates]] for (root@version, column, q, d),
    * or None when [[collectGramStats]] has not covered that exact
    * config — metadata reads only, no jobs. */
  private[graft] def readGramStats(spark: org.apache.spark.sql.SparkSession,
                                   root: String, column: String,
                                   maxDist: Int, q: Int, v: Long)
      : Option[GramEstimates] = {
    val dir = gramStatsDir(root, v, column, maxDist, q)
    val scalars = MetaIO.join(dir.toString, "scalars")
    if (!MetaIO.exists(scalars)) return None
    // a truncated/corrupt scalars file must DEGRADE to the per-query-
    // priced path (the stated fallback contract), never crash a query
    val kv = scala.util.Try {
      MetaIO.readString(scalars).split("\n")
        .map(_.split("=", 2)).collect { case Array(k, x) => k -> x.toDouble }
        .toMap
    }.getOrElse(return None)
    for {
      n <- kv.get("n"); selfCand <- kv.get("selfCand")
      sg <- kv.get("shortGramCand")
      tiny <- kv.get("tiny"); short <- kv.get("short")
    } yield GramEstimates(n * n, selfCand, sg, tiny * tiny,
      short * short,
      Some(() => spark.read.parquet(
        MetaIO.join(dir.toString, "grams").toString)))
  }

  /** [[selfPairs]] over a STORED snapshot-table column: when the
    * gram-statistics sidecar covers (version, column, q, maxDist),
    * every plan gate answers from recorded metadata and the signature
    * ranking is one sidecar join — ZERO pricing jobs
    * ([[pricingJobs]]-asserted in the spec); without coverage it
    * falls back to the per-query-priced [[selfPairs]], answer-
    * identical either way. */
  def selfPairsStored(spark: org.apache.spark.sql.SparkSession,
                      root: String, column: String, maxDist: Int,
                      q: Int = 3,
                      maxShortCandidates: Long = 100000000L,
                      maxGramCandidates: Long = 25000000L,
                      version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else SnapshotTable.latestVersion(root)
    require(v >= 0, s"no committed version at $root")
    val base = SnapshotTable.read(spark, root, v)
    val stored = readGramStats(spark, root, column, maxDist, q, v)
    matchesPlanned(base, column, base, column, maxDist, q,
      maxShortCandidates, maxGramCandidates, stored, self = true)
      .filter(col("a") < col("b"))
  }
}
