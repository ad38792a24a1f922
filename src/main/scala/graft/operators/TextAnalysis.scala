package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Text analysis for LLM training-data pipelines: language-ID, quality
  * scoring, token counting, fingerprinting — all narrow projections or
  * single-shuffle aggregations over the `documents` table.
  */
object TextAnalysis {

  /** Per-language stopword marker lists (ASCII heuristic). */
  val Stopwords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and", "en" -> "to",
    "en" -> "in", "en" -> "is", "en" -> "for", "en" -> "on", "en" -> "with",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "y", "es" -> "en",
    "es" -> "que", "es" -> "los", "es" -> "por", "es" -> "con", "es" -> "una",
    "de" -> "der", "de" -> "die", "de" -> "das", "de" -> "und", "de" -> "ist",
    "de" -> "von", "de" -> "mit", "de" -> "den", "de" -> "auf", "de" -> "ein",
    "fr" -> "le", "fr" -> "la", "fr" -> "de", "fr" -> "et", "fr" -> "les",
    "fr" -> "des", "fr" -> "en", "fr" -> "une", "fr" -> "du", "fr" -> "dans")

  private def tokens = split(trim(lower(col("text"))), "\\s+")

  /** Language-ID: stopword-hit scoring per language, argmax with
    * lexicographic tie-break, 'und' when nothing matches. The stopword
    * table is broadcast; one shuffle on doc_id for the score argmax. */
  def langId(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    val sw = Stopwords.toDF("sw_lang", "sw_word")
    val toks = docs.select(col("doc_id"), explode(tokens).as("tok"))
    val scores = toks.join(broadcast(sw), col("tok") === col("sw_word"))
      .groupBy("doc_id", "sw_lang").agg(count(lit(1)).as("score"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("sw_lang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("sw_lang").as("pred_lang"), col("score"))
    docs.select("doc_id").join(scores, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("pred_lang"), lit("und")).as("pred_lang"),
        coalesce(col("score"), lit(0L)).as("score"))
  }

  /** Quality scoring: length / word-length / distinct-word ratios and a
    * boolean keep-verdict. Pure projection, no shuffle. */
  def quality(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", tokens)
      .withColumn("n_words", size(col("w")).cast("bigint"))
      .withColumn("n_distinct_words",
        size(array_distinct(col("w"))).cast("bigint"))
      .withColumn("char_sum",
        expr("aggregate(w, 0L, (acc, x) -> acc + length(x))"))
      .withColumn("avg_word_len",
        col("char_sum").cast("double") / col("n_words").cast("double"))
      .withColumn("distinct_ratio",
        col("n_distinct_words").cast("double") / col("n_words").cast("double"))
      .withColumn("punct_count",
        length(regexp_replace(col("text"), "[A-Za-z0-9\\s]", "")).cast("bigint"))
      .withColumn("quality_pass",
        col("n_words") >= 5 && col("n_words") <= 100000 &&
          col("distinct_ratio") >= 0.1 && col("avg_word_len") >= 2.0 &&
          col("avg_word_len") <= 20.0)
      .select("doc_id", "n_words", "n_distinct_words", "avg_word_len",
        "distinct_ratio", "punct_count", "quality_pass")

  /** Token counting: whitespace tokens, BPE-ish regex tokens, and the
    * chars/4 estimate. Pure projection. */
  def tokenCount(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(tokens).cast("bigint").as("ws_tokens"),
      size(regexp_extract_all(col("text"),
        lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0))).cast("bigint")
        .as("regex_tokens"),
      ceil(col("n_chars").cast("double") / 4.0d).cast("bigint")
        .as("est_bpe_tokens"))

  /** Corpus rollup: per predicted language, doc/token totals and the
    * quality pass rate — the summary table a training-data pipeline
    * serves after its per-doc passes. Composes langId/tokenCount/
    * quality (each a narrow pass over documents), joins on doc_id, and
    * reduces with one shuffle on the language key; at scale the per-doc
    * outputs are the materialized silver tables this reads. */
  def corpusStats(spark: SparkSession, docs: DataFrame): DataFrame = {
    val lid = langId(spark, docs).select("doc_id", "pred_lang")
    val tok = tokenCount(docs).select("doc_id", "ws_tokens", "est_bpe_tokens")
    val q = quality(docs).select("doc_id", "quality_pass")
    val chars = docs.select("doc_id", "n_chars")
    lid.join(tok, "doc_id").join(q, "doc_id").join(chars, "doc_id")
      .groupBy("pred_lang")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("total_ws_tokens"),
        sum("est_bpe_tokens").as("total_est_bpe_tokens"),
        (sum(when(col("quality_pass"), 1L).otherwise(0L)).cast("double") /
          count(lit(1))).as("quality_pass_rate"),
        (sum("n_chars").cast("double") / count(lit(1))).as("avg_chars"))
  }

  /** Corpus vocabulary: top-k tokens by total occurrences (tie-broken
    * lexicographically), with document frequency — the vocab/stopword
    * discovery pass of a tokenizer-training pipeline.
    *
    * Scale: one shuffle on the token key with map-side partial
    * aggregation (heavy hitters combine before the exchange); the
    * global top-k is `TakeOrderedAndProject` — a per-partition bounded
    * heap merged on the driver over k rows, never a global sort. */
  def vocabTopK(docs: DataFrame, k: Int = 100): DataFrame =
    docs.select(col("doc_id"), explode(tokens).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("total_occurrences"),
        countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("total_occurrences").desc, col("token"))
      .limit(k)

  /** The redaction / stopword stoplist used by [[clean]]: every distinct
    * marker word from the language tables. */
  val CleanStoplist: Seq[String] = Stopwords.map(_._2).distinct.sorted

  private val UrlRe = "https?://[^\\s]+"
  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Text cleaning: URL/email redaction (PII scrubbing) + stopword
    * removal — the normalization pass before dedup/tokenization in a
    * training-data pipeline. Pure projection, no shuffle; all regexes
    * are RE2-compatible (no backreferences) so the DuckDB oracle runs
    * the identical patterns.
    *
    * Order matters and is mirrored exactly in the oracle: count URLs
    * and emails on the RAW text, redact URLs then emails, then
    * tokenize the redacted text and drop stoplist words (duplicate
    * occurrences preserved — array filter, not set difference). */
  def clean(docs: DataFrame): DataFrame = {
    val stop = array(CleanStoplist.map(lit): _*)
    docs
      .withColumn("n_urls",
        size(regexp_extract_all(col("text"), lit(UrlRe), lit(0))).cast("bigint"))
      .withColumn("n_emails",
        size(regexp_extract_all(col("text"), lit(EmailRe), lit(0))).cast("bigint"))
      .withColumn("redacted",
        regexp_replace(regexp_replace(col("text"), UrlRe, "<URL>"),
          EmailRe, "<EMAIL>"))
      .withColumn("w", split(trim(lower(col("redacted"))), "\\s+"))
      .withColumn("kept", filter(col("w"), t => !array_contains(stop, t)))
      .select(
        col("doc_id"),
        array_join(col("kept"), " ").as("clean_text"),
        col("n_urls"), col("n_emails"),
        (size(col("w")) - size(col("kept"))).cast("bigint")
          .as("n_stopwords_removed"),
        size(col("kept")).cast("bigint").as("n_tokens_kept"))
  }

  /** Per-stratum sampling rates for [[stratifiedSample]]: the dataset-
    * mixing weights of a training-data pipeline (down-weight the
    * dominant language, thin the noisy tail). */
  val SampleRates: Seq[(String, Double)] = Seq(
    "en" -> 0.5, "de" -> 1.0, "es" -> 1.0, "fr" -> 1.0, "zh" -> 0.25)

  /** Deterministic stratified sampling by the `lang` column: keep a doc
    * iff its 60-bit md5 bucket (over the doc_id, mod 1000) falls below
    * `rate(lang) * 1000`. Hash-based, so the sample is reproducible
    * under any partitioning and any engine — no RNG, no global state;
    * rescaling a rate only adds/removes rows monotonically.
    *
    * Scale: pure projection + filter (the rate table folds to a CASE
    * expression), no shuffle; at 100 TB the filter pushes to the scan's
    * row-group level after the hash projection. */
  def stratifiedSample(docs: DataFrame,
                       rates: Seq[(String, Double)] = SampleRates): DataFrame = {
    val rateCol = rates.foldLeft(lit(0.0)) { case (acc, (l, r)) =>
      when(col("lang") === l, lit(r)).otherwise(acc)
    }
    docs
      .withColumn("sample_rate", rateCol)
      .withColumn("bucket",
        expr(s"pmod(${Hashing.sid60Spark("cast(doc_id as string)")}, 1000)"))
      .filter(col("bucket") < col("sample_rate") * 1000.0d)
      .select("doc_id", "lang", "source", "bucket", "sample_rate")
  }

  /** Deterministic train/validation/test split by stable content-free
    * hash: a doc's 60-bit md5 id mod 100 buckets it into train
    * (< trainPct), validation (< trainPct+valPct), or test — the
    * standard holdout assignment a training pipeline needs to be (a)
    * reproducible across reruns and engines (the md5 bridge both
    * engines compute bit-identically), (b) STABLE under corpus growth
    * (a doc's split never flips as other docs arrive — row_number or
    * rand() splits both fail this), and (c) shuffle-free (a narrow
    * projection at any corpus size). */
  def datasetSplit(docs: DataFrame, trainPct: Int = 90,
                   valPct: Int = 5): DataFrame = {
    require(trainPct > 0 && valPct >= 0 && trainPct + valPct < 100,
      "split percentages must leave room for test")
    docs
      .withColumn("bucket",
        expr(s"pmod(${Hashing.sid60Spark("cast(doc_id as string)")}, 100)"))
      .withColumn("split",
        when(col("bucket") < trainPct, lit("train"))
          .when(col("bucket") < trainPct + valPct, lit("validation"))
          .otherwise(lit("test")))
      .select("doc_id", "lang", "source", "bucket", "split")
  }

  /** Token-count distribution profile per language: exact discrete
    * p50/p90/p99 of whitespace tokens per document — the length
    * histogram a curation pipeline reads before choosing packing and
    * truncation limits.
    *
    * Quantiles are DISCRETE (the value at rank ceil(p·n), total-order
    * tie-break by doc_id) and the rank index is computed in integer
    * arithmetic (`(p_num·n + p_den − 1) div p_den`), so there is no
    * floating-point interpolation to drift between engines.
    *
    * Scale: one window shuffle on the language key (the per-language
    * sort is the cost — at extreme skew, profile on a stratified
    * sample instead); the rollup reduces to |languages| rows. */
  def tokenPercentiles(docs: DataFrame): DataFrame = {
    val t = docs.select(col("lang"), col("doc_id"),
      size(tokens).cast("bigint").as("ws_tokens"))
    val ranked = t
      .withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy(col("ws_tokens"), col("doc_id")))
        .cast("bigint"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
    def at(num: Int, den: Int) =
      min(when(col("rn") === expr(s"($num * n + ${den - 1}) div $den"),
        col("ws_tokens")))
    ranked.groupBy("lang").agg(
      max(col("n")).as("n_docs"),
      at(1, 2).as("p50_tokens"),
      at(9, 10).as("p90_tokens"),
      at(99, 100).as("p99_tokens"))
  }

  /** The 100 TB path of [[tokenPercentiles]]: mergeable
    * Greenwald-Khanna sketches (`percentile_approx`) instead of exact
    * discrete ranks — a single pass with map-side partial sketches and
    * NO per-language sort, at bounded rank error 1/`accuracy`. Exact
    * ranks need the window sort, which is the one per-language
    * scale hazard in the exact operator; this variant trades ≤0.1%
    * rank error (default) for sort-free linear scaling.
    *
    * Not oracle-checked (sketch internals are engine-specific — GK
    * results are only rank-bounded, not bit-stable across engines);
    * the ScalaTest bounds its deviation against the exact operator. */
  def tokenPercentilesApprox(docs: DataFrame,
                             accuracy: Int = 1000): DataFrame =
    docs.select(col("lang"),
        size(tokens).cast("bigint").as("ws_tokens"))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_docs"),
        percentile_approx(col("ws_tokens"), lit(0.5), lit(accuracy))
          .as("p50_tokens"),
        percentile_approx(col("ws_tokens"), lit(0.9), lit(accuracy))
          .as("p90_tokens"),
        percentile_approx(col("ws_tokens"), lit(0.99), lit(accuracy))
          .as("p99_tokens"))

  /** The 100 TB path of [[vocabTopK]]'s document frequency and
    * [[corpusStats]]-style distinct counting: HyperLogLog++ sketches
    * (`approx_count_distinct`) — constant memory per group and
    * mergeable partials, vs the exact `countDistinct` whose expand +
    * dedup cost grows with group cardinality. Relative error defaults
    * to 2.3% (rsd 0.023); tested against exact counts. */
  def vocabTopKApprox(docs: DataFrame, k: Int = 100,
                      rsd: Double = 0.023): DataFrame =
    docs.select(col("doc_id"), explode(tokens).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("total_occurrences"),
        approx_count_distinct(col("doc_id"), rsd).as("doc_freq"))
      .orderBy(col("total_occurrences").desc, col("token"))
      .limit(k)

  /** Benchmark decontamination: flag corpus documents sharing any
    * word-3-gram shingle with the held-out evaluation set (here: the
    * `evalSource` shard) — the standard pre-training decontamination
    * pass. Emits one row per contaminated doc with its distinct shared
    * shingle count.
    *
    * Scale: the eval shingle vocabulary is normally tiny next to the
    * corpus (benchmark suites, not training shards) — it reduces to a
    * distinct set and the probe is a broadcast inner join on the
    * shingle key; the rollup is one shuffle on doc_id. The broadcast is
    * HINTED only while the distinct set stays under
    * `maxBroadcastShingles` (measured off the persisted set — the same
    * planning-time stat every broadcast decision needs); above it the
    * join is left un-hinted, so an oversized eval suite degrades to a
    * shuffled join instead of OOM-ing the driver. */
  def decontaminate(docs: DataFrame, evalSource: String = "src0",
                    maxBroadcastShingles: Long = 5000000L): DataFrame = {
    // each side shingles ONLY its slice — the source filter sits below
    // the shingle projection + explode BY CONSTRUCTION (not left to
    // filter pushdown through the Generate), so the eval side tokenizes
    // just the eval suite and the corpus side is exploded exactly once;
    // the broadcast hash join then IS the semi-join prune of the
    // corpus-side shingles (no shuffle of the exploded corpus)
    def inv(slice: DataFrame): DataFrame = Dedup.shingled(slice)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val evalShingles = inv(docs.filter(col("source") === evalSource))
      .select("sh").distinct().persist()
    val probe =
      if (evalShingles.count() <= maxBroadcastShingles) broadcast(evalShingles)
      else evalShingles
    inv(docs.filter(col("source") =!= evalSource))
      .join(probe, "sh")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shared_shingles"))
  }

  /** Default context length for [[sequencePacking]]. */
  val PackContextTokens = 512

  /** Sequential sequence packing: docs are packed in doc_id order into
    * fixed-token context windows, independently per source shard (the
    * unit a packing job actually processes — and what keeps the running
    * sum a per-partition window, never a global one). A doc goes to the
    * pack that was open when it arrived: pack_id = floor(preceding-token
    * cumsum / context). Emits per-pack occupancy for the utilization
    * report that sizes a packing run.
    *
    * One window shuffle on the source key; the rollup reduces to
    * ‖packs‖ rows. Total order inside a shard is (doc_id), unique, so
    * the result is deterministic on both engines. */
  def sequencePacking(docs: DataFrame,
                      contextTokens: Int = PackContextTokens): DataFrame = {
    val w = Window.partitionBy("source").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(col("source"), col("doc_id"),
        size(tokens).cast("bigint").as("ws_tokens"))
      .withColumn("cum", sum("ws_tokens").over(w))
      .withColumn("pack_id",
        expr(s"(cum - ws_tokens) div $contextTokens"))
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"),
        sum("ws_tokens").as("pack_tokens"))
  }

  /** Gopher-style repetition quality filters: most-frequent-word
    * fraction and duplicate-bigram fraction, with a keep verdict —
    * the repetition gate of a pre-training curation pipeline
    * (boilerplate and keyword-stuffed pages score high on both).
    *
    * Shuffle-FREE: the max word frequency is a run-length fold over the
    * doc's sorted token array (a sorted array's longest equal-run IS
    * the top count) and bigrams are lambda-args-only `zip_with` over
    * shifted slices — no explode, no groupBy, the whole operator is a
    * projection that scales embarrassingly. The oracle computes the
    * same integers via unnest+GROUP BY; counts are exact so the plans
    * agree bit-for-bit, and the fractions are IEEE divisions of those
    * integers. */
  def repetition(docs: DataFrame): DataFrame =
    docs
      .withColumn("w", tokens)
      .withColumn("n_words", size(col("w")).cast("bigint"))
      .withColumn("top_word_count", expr(
        """aggregate(
          |  array_sort(w),
          |  named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),
          |  (acc, x) -> named_struct(
          |    'prev', x,
          |    'run', if(acc.prev <=> x, acc.run + 1L, 1L),
          |    'best', greatest(acc.best,
          |      if(acc.prev <=> x, acc.run + 1L, 1L))),
          |  acc -> acc.best)""".stripMargin))
      .withColumn("bg", expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> concat(a, ' ', b))"))
      .withColumn("n_bigrams", size(col("bg")).cast("bigint"))
      .withColumn("n_distinct_bigrams",
        size(array_distinct(col("bg"))).cast("bigint"))
      .withColumn("top_word_frac",
        col("top_word_count").cast("double") / col("n_words").cast("double"))
      .withColumn("dup_bigram_frac",
        when(col("n_bigrams") === 0, lit(0.0d)).otherwise(
          (col("n_bigrams") - col("n_distinct_bigrams")).cast("double") /
            col("n_bigrams").cast("double")))
      .withColumn("repetition_pass",
        col("top_word_frac") <= 0.10d && col("dup_bigram_frac") <= 0.10d)
      .select("doc_id", "n_words", "top_word_count", "top_word_frac",
        "n_bigrams", "n_distinct_bigrams", "dup_bigram_frac",
        "repetition_pass")

  /** Bigram language-model statistics — the merge-pair counting step of
    * BPE tokenizer training and the conditional-probability table of an
    * n-gram LM: top-k adjacent token pairs by corpus count, each with
    * P(b|a) = count(a b) / count(a).
    *
    * Scale: bigrams come from the same lambda-args-only `zip_with` as
    * [[repetition]] (no cross-doc state), pair and unigram counts are
    * one shuffle each with map-side partials (heavy-hitter pairs
    * combine before the exchange), the conditional joins pair counts to
    * unigram counts on the first-token key, and the global top-k is a
    * bounded `TakeOrderedAndProject`, never a full sort. */
  def bigramLm(docs: DataFrame, k: Int = 100): DataFrame = {
    val bg = docs
      .withColumn("w", tokens)
      .select(explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> concat(a, ' ', b))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("pair_count"))
      .withColumn("token_a", element_at(split(col("pair"), " "), 1))
      .withColumn("token_b", element_at(split(col("pair"), " "), 2))
    val uni = docs
      .select(explode(tokens).as("token_a"))
      .groupBy("token_a").agg(count(lit(1)).as("unigram_count"))
    bg.join(uni, "token_a")
      .withColumn("cond_p",
        col("pair_count").cast("double") / col("unigram_count").cast("double"))
      .select("token_a", "token_b", "pair_count", "unigram_count", "cond_p")
      .orderBy(col("pair_count").desc, col("token_a"), col("token_b"))
      .limit(k)
  }

  /** Per-document LM quality scoring — the CCNet-style pass that ranks
    * corpus docs by how well a reference-domain language model predicts
    * them (a perplexity filter without the cross-engine libm hazard:
    * `ln` is not correctly-rounded, so the score is the ARITHMETIC mean
    * of add-one-smoothed transition probabilities, built entirely from
    * exact integer ratios and one correctly-rounded IEEE division per
    * bigram). The LM is the bigram/unigram count table of the
    * `lmSource` shard; every doc (any shard) with ≥ 2 tokens is scored:
    * `p(b|a) = (c(ab) + 1) / (c(a) + V)` with V = LM vocab size;
    * `n_unseen` counts bigrams absent from the LM (the OOV signal).
    *
    * Determinism: the per-doc mean folds p values in strict position
    * order (sort_array(collect_list) + aggregate on this side,
    * `list(p ORDER BY pos)` + list_reduce in the oracle), so the IEEE
    * sum is bit-identical — a plain SUM would be partition-order
    * dependent. Rounded at 8 decimals like every double at the
    * contract boundary.
    *
    * Scale: LM tables are corpus-level aggregates (two count shuffles
    * with map-side partials); scoring joins each doc bigram to them on
    * the pair / first-token keys (both sides already reduced — the LM
    * is broadcast-able for bounded vocabularies and the join
    * co-partitions otherwise), then one doc_id rollup. The per-doc
    * collect_list is bounded by doc length — the same per-doc-array
    * envelope every shingle/chunk op here already assumes. */
  def bigramDocScore(docs: DataFrame, lmSource: String = "src1"): DataFrame = {
    val lmDocs = docs.filter(col("source") === lmSource)
    val lmBg = lmDocs
      .withColumn("w", tokens)
      .select(explode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> concat(a, ' ', b))")).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("pair_count"))
    val lmUni = docs.filter(col("source") === lmSource)
      .select(explode(tokens).as("a"))
      .groupBy("a").agg(count(lit(1)).as("uni_count"))
    val vocab = broadcast(lmUni.agg(count(lit(1)).as("v")))
    val docBg = docs
      .withColumn("w", tokens)
      .filter(size(col("w")) >= 2)
      .select(col("doc_id"), posexplode(expr(
        "zip_with(slice(w, 1, size(w) - 1), slice(w, 2, size(w) - 1)," +
          " (a, b) -> concat(a, ' ', b))")).as(Seq("pos", "pair")))
      .withColumn("a", element_at(split(col("pair"), " "), 1))
    docBg
      .join(lmBg, Seq("pair"), "left")
      .join(lmUni, Seq("a"), "left")
      .crossJoin(vocab)
      .withColumn("p",
        (coalesce(col("pair_count"), lit(0L)) + lit(1L)).cast("double") /
          (coalesce(col("uni_count"), lit(0L)) + col("v")).cast("double"))
      .withColumn("unseen",
        when(col("pair_count").isNull, 1L).otherwise(0L))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        sum("unseen").as("n_unseen"),
        sort_array(collect_list(struct(col("pos"), col("p")))).as("ps"))
      .select(col("doc_id"), col("n_bigrams"), col("n_unseen"),
        graft.functions.Rounding.roundScaled(
          expr("aggregate(ps, cast(0 as double), (acc, s) -> acc + s.p)") /
            col("n_bigrams").cast("double"), 8).as("avg_p"))
  }

  /** The end-of-pipeline curation verdict — the single table a dataset
    * release is cut from: every per-doc filter signal joined into one
    * row with the final keep decision and its reasons as individual
    * boolean columns (heuristic quality, Gopher repetition, exact-dup
    * canonicality, benchmark contamination). `keep` is the conjunction
    * a curation run applies before sampling/packing.
    *
    * Scale: quality/repetition are shuffle-free projections; the
    * canonical list is the exact-dedup aggregate (one shuffle) and the
    * contamination list one more — both reduce far below corpus size
    * and left-join back on doc_id, where all four joins share one
    * co-partitioning. */
  def curationReport(docs: DataFrame, evalSource: String = "src0"): DataFrame = {
    val q = quality(docs).select("doc_id", "quality_pass")
    val rep = repetition(docs).select("doc_id", "repetition_pass")
    val canon = Dedup.exact(docs)
      .select(col("keep_doc_id").as("doc_id"), lit(true).as("_canon"))
    val cont = decontaminate(docs, evalSource)
      .select(col("doc_id"), lit(true).as("_cont"))
    docs.select("doc_id")
      .join(q, Seq("doc_id"))
      .join(rep, Seq("doc_id"))
      .join(canon, Seq("doc_id"), "left")
      .join(cont, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality_pass"), col("repetition_pass"),
        coalesce(col("_canon"), lit(false)).as("is_canonical"),
        coalesce(col("_cont"), lit(false)).as("contaminated"))
      .withColumn("keep",
        col("quality_pass") && col("repetition_pass") &&
          col("is_canonical") && !col("contaminated"))
  }

  /** Sliding-window document chunking — the unit-of-embedding split of
    * a RAG / embedding-index pipeline: fixed `chunkSize`-token windows
    * every `stride` tokens (overlap = chunkSize − stride), the last
    * window clamped to the document end so every token is covered and
    * no chunk starts past the end. Docs at or under `chunkSize` yield
    * exactly one chunk.
    *
    * Shuffle-FREE: tokenize, compute the chunk count in integer
    * arithmetic (`(n − size + stride − 1) div stride + 1` — no float
    * ceil to drift between engines), explode a 0..n_chunks−1 sequence,
    * and slice the token array per chunk. Output size is ~n/stride
    * rows per doc, linear in corpus tokens, embarrassingly parallel. */
  def docChunks(docs: DataFrame, chunkSize: Int = 32,
                stride: Int = 24): DataFrame = {
    require(stride > 0 && chunkSize >= stride,
      s"need 0 < stride <= chunkSize, got $stride / $chunkSize")
    docs
      .select(col("doc_id"), tokens.as("w"))
      .withColumn("n", size(col("w")).cast("bigint"))
      .withColumn("n_chunks",
        when(col("n") <= chunkSize, lit(1L)).otherwise(
          expr(s"(n - $chunkSize + ${stride - 1}) div $stride + 1")))
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), col("n_chunks") - 1)))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        array_join(
          slice(col("w"), (col("chunk_idx") * stride + 1).cast("int"),
            lit(chunkSize)), " ").as("chunk_text"),
        least(lit(chunkSize.toLong),
          col("n") - col("chunk_idx") * stride).as("n_tokens"))
  }

  /** Document fingerprinting: content md5 + length + a 64-char-prefix
    * polynomial rolling hash (31^i mod 1e9+7). Pure projection. */
  def fingerprint(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      md5(col("text").cast("binary")).as("md5_hash"),
      col("n_chars"),
      // guard empty text: sequence(1, 0) DESCENDS in Spark -> index 0
      expr(
        s"cast(if(length(text) < 1, 0L, aggregate(" +
          s"sequence(1, least(64, length(text))), 0L, " +
          s"(acc, i) -> acc + ascii(substring(text, i, 1)) * " +
          s"element_at(${Hashing.pow31Spark}, i)) % ${Hashing.FpP}L) as bigint)")
        .as("prefix_hash"))
}
