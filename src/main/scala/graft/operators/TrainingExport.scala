package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-ready dataset export — the endgame of the curation
  * pipeline (the tokenize→shuffle→shard step between a curated corpus
  * and a trainer's data loader; the reference stops at marts, every
  * LLM data stack ships this as its final operator):
  *
  *  - DETERMINISTIC GLOBAL SHUFFLE without a global sort: shard =
  *    md5-prefix mod (hash-random assignment, one ordinary hash
  *    exchange), order within shard = full md5 digest. Together that
  *    is a stable pseudo-random permutation of the corpus — same
  *    input, same permutation, on any cluster at any parallelism —
  *    with NO single-partition window and NO range sort. Training
  *    epochs shuffle by re-keying with a salt, not by re-shuffling
  *    bytes.
  *  - PACKING rides the same exchange: the greedy cumulative-token
  *    fill ([[TextAnalysis.sequencePacking]]'s mechanics) runs as a
  *    window over the shard partitioning the shuffle already
  *    produced — one exchange for shuffle + pack + manifest.
  *  - EXPORT writes one directory per shard (`partitionBy`), so a
  *    data-loader rank reads exactly its shard dirs, plus a manifest
  *    table (docs / packs / tokens / fill ratio per shard) — the
  *    index file trainers resume from.
  *
  * 100 TB: md5 assignment balances shards to within sampling noise;
  * the per-shard sort is `‖corpus‖/shards` rows under a bounded-memory
  * external sort, and everything downstream of the one exchange is
  * narrow. */
object TrainingExport {

  /** Per-document shard / shuffle-order / pack assignment.
    * Deterministic in `doc_id` alone; a non-empty `salt` re-keys the
    * whole permutation — the per-EPOCH reshuffle, costing one string
    * concat instead of moving any bytes. */
  def plan(docs: DataFrame, shards: Int = 8,
           contextTokens: Int = 2048, salt: String = ""): DataFrame = {
    require(shards > 0 && contextTokens > 0,
      "shards and contextTokens must be positive")
    val key =
      if (salt.isEmpty) md5(col("doc_id").cast("string"))
      else md5(concat(col("doc_id").cast("string"), lit(":" + salt)))
    val keyed = docs
      .select(col("doc_id"), col("text"))
      .withColumn("shuffle_key", key)
      .withColumn("shard",
        (conv(substring(col("shuffle_key"), 1, 6), 16, 10)
          .cast("long") % shards).cast("long"))
      .withColumn("ws_tokens",
        size(split(trim(lower(col("text"))), "\\s+")).cast("long"))
    val order = Window.partitionBy("shard")
      .orderBy("shuffle_key", "doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    keyed
      .withColumn("cum", sum("ws_tokens").over(order))
      .withColumn("pack_id",
        expr(s"(cum - ws_tokens) div $contextTokens"))
      .select("doc_id", "shard", "shuffle_key", "ws_tokens", "pack_id")
  }

  /** 16^13 = 2^52: a 13-hex-digit hash prefix is an EXACT double, and
    * dividing by a power of two is exact scaling — so the unit-interval
    * hash below is bit-identical across engines (the oracle computes
    * the same value from the same digest). */
  private val UnitDenom = 4503599627370496.0

  /** Deterministic mixture sampling: materialize each source at its
    * (possibly >1) `epochs` rate from [[Mixture.plan]] — `floor(rate)`
    * full copies tagged `epoch = 0..`, plus one fractional epoch kept
    * where the per-(doc, epoch) unit-interval hash falls under the
    * fraction. No randomness: re-running reproduces the sample
    * exactly; `salt` re-draws it. The rates relation is ‖sources‖-sized
    * and broadcast; the fan-out is the target token budget itself, so
    * cost tracks the OUTPUT, not a shuffle. */
  def sampleToRates(docs: DataFrame, rates: DataFrame,
                    salt: String = ""): DataFrame = {
    // a rate ≤ 0 drops the source entirely (sequence(0, ceil(0)-1)
    // would DESCEND to [0,-1] and emit a phantom full copy at epoch -1)
    val live = rates.select("source", "epochs")
      .filter(col("epochs") > 0.0)
    val keep = docs.join(broadcast(live), Seq("source"))
      .withColumn("epoch",
        explode(expr("sequence(0L, cast(ceil(epochs) as long) - 1L)")))
      .withColumn("u",
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(s":$salt:"), col("epoch").cast("string"))), 1, 13),
          16, 10).cast("double") / lit(UnitDenom))
      .filter(col("epoch").cast("double") < floor(col("epochs")) ||
        col("u") < col("epochs") - floor(col("epochs")))
    keep.select((docs.columns.map(col) :+ col("epoch")).toIndexedSeq: _*)
  }

  /** The shard index a trainer resumes from: docs, packs, token mass,
    * and mean fill ratio per shard. */
  def manifest(plan: DataFrame, contextTokens: Int = 2048): DataFrame =
    plan.groupBy("shard")
      .agg(count(lit(1)).as("n_docs"),
        (max("pack_id") + 1L).as("n_packs"),
        sum("ws_tokens").as("shard_tokens"))
      .withColumn("fill_ratio",
        col("shard_tokens").cast("double") /
          (col("n_packs") * lit(contextTokens.toLong)).cast("double"))

  /** Materialize the export: one `shard=K/` directory of shuffle-ordered
    * packed documents (text carried alongside its plan columns) plus a
    * `_manifest` parquet. Returns the manifest. */
  def export(spark: SparkSession, docs: DataFrame, outDir: String,
             shards: Int = 8, contextTokens: Int = 2048): DataFrame = {
    // one materialization serves both the data write and the manifest
    // aggregation (the plan's shuffle+window lineage would otherwise
    // run twice over the corpus)
    val p = plan(docs, shards, contextTokens).persist()
    try {
      p.join(docs.select("doc_id", "text"), Seq("doc_id"))
        .repartition(col("shard"))
        .sortWithinPartitions("shard", "shuffle_key", "doc_id")
        .write.mode("overwrite").partitionBy("shard")
        .parquet(s"$outDir/data")
      val m = manifest(p, contextTokens)
      m.coalesce(1).write.mode("overwrite").parquet(s"$outDir/_manifest")
    } finally p.unpersist()
    spark.read.parquet(s"$outDir/_manifest")
  }
}
