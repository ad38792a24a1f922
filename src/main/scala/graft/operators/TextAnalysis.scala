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
