package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join: attach to each left row the latest right row
  * (per key) whose timestamp is at-or-before the left row's timestamp —
  * the canonical time-series enrichment operator (quote-at-trade-time,
  * mark-to-last-candle). The reference serves this shape through Trino
  * window queries over the marts; here it is a first-class operator.
  *
  * Spark-first plan: Spark has no ASOF JOIN and a naive range join
  * explodes (every left row matches ALL earlier right rows before the
  * per-row argmax — O(|L|·|R|) within a key). Instead, union both
  * sides tagged with a side flag and run ONE running-window
  * `last(value, ignoreNulls)` ordered by (ts, side): right rows deposit
  * their payload, left rows read the most recent deposit. One shuffle
  * on the key, linear scan per partition, no join blow-up — this is the
  * plan that survives a 100 TB fact table (the window is
  * UNBOUNDED PRECEDING → Spark's incremental frame, O(n) total).
  *
  * Semantics (matches DuckDB `ASOF LEFT JOIN ... ON l.ts >= r.ts`):
  * inclusive at-or-before — a right row at exactly the left timestamp
  * wins (side flag orders right(0) before left(1) within a timestamp).
  * Left rows with no prior right row keep NULL payloads.
  *
  * Requirement: right rows are unique per (keys, rightTs) — otherwise
  * "the" latest right row is ill-defined. Candle tables satisfy this by
  * construction.
  */
object AsofJoin {

  /** Generic as-of join.
    *
    * @param pick right-side payload columns to carry onto left rows;
    *             names must not collide with left columns.
    * @param tolerance optional max staleness as a Spark interval string
    *             (e.g. "2 hours"): a right row older than
    *             `leftTs − tolerance` is treated as NO match (the
    *             pandas `merge_asof(tolerance=...)` / kdb window-join
    *             bound). Requires timestamp-typed ts columns.
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String, pick: Seq[String],
           tolerance: Option[String] = None): DataFrame = {
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("_asof_ts") :+
        lit(0).as("_asof_side")) ++ pick.map(c => col(c).as(s"_asof_$c")): _*)
    val l = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Deposit the matched right row as ONE struct (ts + all payloads):
    // per-column last(ignoreNulls) would skip a matched row's NULL
    // payload and fall back to an OLDER row — wrong vs ASOF semantics,
    // and different picks could then come from different right rows.
    // A single struct deposit is also a single Window expression.
    val u = l.unionByName(r, allowMissingColumns = true)
    val payload = struct(col("_asof_ts").as("_mts") +:
      pick.map(c => col(s"_asof_$c").as(c)): _*)
    val joined = u.withColumn("_asof_match",
      last(when(col("_asof_side") === 0, payload), ignoreNulls = true).over(w))
    val inTolerance = tolerance.fold(lit(true)) { t =>
      col("_asof_match._mts") >= col("_asof_ts") - expr(s"INTERVAL $t")
    }
    val withPicks = pick.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(inTolerance, col(s"_asof_match.$c")))
    }
    withPicks.filter(col("_asof_side") === 1)
      .drop("_asof_ts" +: "_asof_side" +: "_asof_match" +:
        pick.map(c => s"_asof_$c"): _*)
  }

  /** Bucketed as-of join — the hot-key scale path.
    *
    * [[asof]]'s running window partitions by the key alone: a
    * pathological single-key tape (one instrument dominating the feed)
    * serializes into one partition. This variant is the classic
    * two-pass parallel prefix scan over time buckets:
    *
    *  1. partition by (key, bucket) and compute the BUCKET-LOCAL
    *     running last deposit — the hot key now spreads across
    *     ‖buckets‖ partitions;
    *  2. reduce each (key, bucket) to its final deposit (`max_by` —
    *     right rows are unique per ts), build the carry-in per bucket
    *     with a `last(ignoreNulls)` window over STRICTLY EARLIER
    *     buckets — this window runs on the reduced ‖keys × buckets‖
    *     table, thousands of rows, never the fact table;
    *  3. join the carry back on (key, bucket) — the probe side is
    *     already hash-partitioned on exactly those keys from pass 1,
    *     so the join reuses the shuffle — and take
    *     `coalesce(bucket-local match, carry-in)`.
    *
    * Result is row-for-row identical to [[asof]] (equivalence-tested);
    * `bucketSeconds` trades carry-table size against per-partition
    * parallelism and only affects performance, never results. */
  def asofBucketed(left: DataFrame, right: DataFrame, keys: Seq[String],
                   leftTs: String, rightTs: String, pick: Seq[String],
                   bucketSeconds: Long = 86400L,
                   tolerance: Option[String] = None): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val r = right.select(
      (keys.map(col) :+ col(rightTs).as("_asof_ts") :+
        lit(0).as("_asof_side")) ++ pick.map(c => col(c).as(s"_asof_$c")): _*)
    val l = left
      .withColumn("_asof_ts", col(leftTs))
      .withColumn("_asof_side", lit(1))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("_asof_bkt",
        expr(s"unix_micros(cast(_asof_ts as timestamp)) div ${bucketSeconds * 1000000L}"))
    val payload = struct(col("_asof_ts").as("_mts") +:
      pick.map(c => col(s"_asof_$c").as(c)): _*)
    val bktKeys = keys.map(col) :+ col("_asof_bkt")

    // pass 1: bucket-local running last (hot key split across buckets)
    val wLocal = Window.partitionBy(bktKeys: _*)
      .orderBy(col("_asof_ts"), col("_asof_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("_local",
      last(when(col("_asof_side") === 0, payload), ignoreNulls = true).over(wLocal))

    // pass 2: ONE aggregate straight off the union folds the bucket
    // domain AND the per-bucket final deposit together:
    // max(struct(ts, payload)) over deposit rows only (max skips the
    // NULLs the when() leaves on left rows; deposit ts is unique per
    // (key, bucket), so the struct max is the latest deposit), NULL
    // for deposit-free buckets — which still get a row, because every
    // bucket needs a carry. Aggregating from `u` (not the window
    // output) means HashAggregate computes PARTIALS map-side: the
    // exchange for this branch ships only ‖keys × buckets × mappers‖
    // partial rows — the fact table itself is shuffled exactly once in
    // the whole operator (the pass-1 window branch). The carry window
    // then runs on the reduced ‖keys × buckets‖ table, never the fact
    // table.
    val wCarry = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_asof_bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = u
      .groupBy(bktKeys: _*)
      .agg(max(when(col("_asof_side") === 0,
        struct(col("_asof_ts"), payload.as("_p")))).as("_mx"))
      .withColumn("_carry",
        last(col("_mx._p"), ignoreNulls = true).over(wCarry))
      .select((keys.map(col) :+ col("_asof_bkt") :+ col("_carry")): _*)

    // pass 3: carry joined back on the SAME (key, bucket) partitioning
    val joined = local
      .join(carry, keys :+ "_asof_bkt", "left")
      .withColumn("_asof_match", coalesce(col("_local"), col("_carry")))
    val inTolerance = tolerance.fold(lit(true)) { t =>
      col("_asof_match._mts") >= col("_asof_ts") - expr(s"INTERVAL $t")
    }
    val withPicks = pick.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(inTolerance, col(s"_asof_match.$c")))
    }
    withPicks.filter(col("_asof_side") === 1)
      .drop("_asof_ts" +: "_asof_side" +: "_asof_bkt" +: "_local" +:
        "_carry" +: "_asof_match" +: pick.map(c => s"_asof_$c"): _*)
  }

  /** Query wrapper: each staging trade marked against the most recent
    * COMPLETED hourly candle of its product (candle effective at its
    * window_end), with the trade's deviation from that candle's vwap —
    * the slippage-vs-recent-vwap enrichment a trading mart serves.
    * Trades in the first hour of a product have no completed candle →
    * NULL candle columns and deviation. */
  def tradeVsPrevHour(stg: DataFrame, h1: DataFrame): DataFrame = {
    val candles = h1.select(
      col("product_id"), col("window_end"),
      col("vwap").as("h1_vwap"), col("close").as("h1_close"))
    asof(stg, candles, Seq("product_id"), "trade_time", "window_end",
      Seq("h1_vwap", "h1_close"))
      .select(
        col("trade_id"), col("product_id"), col("trade_time"), col("price"),
        col("h1_vwap"), col("h1_close"),
        (col("price").cast("double") / col("h1_vwap").cast("double") - 1.0d)
          .as("dev_vs_vwap"))
  }

  /** [[tradeVsPrevHour]] through the hot-key-safe [[asofBucketed]]
    * path (hourly buckets) — identical results by construction, its
    * own oracle key so the scale path stays hash-checked like
    * `ann_topk_bucketed` does for ANN. */
  def tradeVsPrevHourBucketed(stg: DataFrame, h1: DataFrame): DataFrame = {
    val candles = h1.select(
      col("product_id"), col("window_end"),
      col("vwap").as("h1_vwap"), col("close").as("h1_close"))
    asofBucketed(stg, candles, Seq("product_id"), "trade_time", "window_end",
      Seq("h1_vwap", "h1_close"), bucketSeconds = 3600L)
      .select(
        col("trade_id"), col("product_id"), col("trade_time"), col("price"),
        col("h1_vwap"), col("h1_close"),
        (col("price").cast("double") / col("h1_vwap").cast("double") - 1.0d)
          .as("dev_vs_vwap"))
  }
}
