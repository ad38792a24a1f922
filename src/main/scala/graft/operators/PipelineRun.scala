package graft.operators

import java.time.LocalDateTime

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** End-to-end pipeline runner — the orchestration analog.
  *
  * The reference chains bronze → silver → marts → quality as
  * dependency-ordered Airflow DAGs (`orchestration/dags/
  * bronze_to_silver.py:1-80`, `data_quality.py:30-71`, `dbt_gold.py`);
  * here the same DAG is one library call. Each stage is MATERIALIZED
  * exactly once as a partitioned parquet table and downstream stages
  * read the materialized output — the events→silver chain runs ONE
  * time no matter how many marts fan out of it (the per-query
  * `SparkEntry` entries deliberately recompute it per key for gate
  * isolation; a production run must not).
  *
  * Two entry points mirror the reference's two operating modes:
  *
  *  - [[run]] — full rebuild (backfill / first deployment);
  *  - [[runIncremental]] — the 30-minute scheduled mode
  *    (`orchestration/dags/bronze_to_silver.py:1-80` +
  *    `bronze_to_silver.py:74-91`): append the new raw batch to
  *    bronze, read only rows ingested since the last run's persisted
  *    watermark (minus a late-arrival lookback), MERGE them into
  *    silver, and rewrite ONLY the date partitions the batch touched,
  *    in every mart. Nothing outside the touched partitions is read
  *    or written (partition-pruned scans + dynamic partition
  *    overwrite), which is what survives 100 TB operationally: run
  *    cost scales with the batch, not the table.
  *
  * Ordering and failure semantics match the DAG: stages run in
  * dependency order with per-stage retries, the quality gate runs LAST
  * over the run's tables, and `failOnViolations` makes a red check
  * abort the run with the failing check names (the DAG's fail-fast
  * task), AFTER the report itself is persisted for debugging.
  *
  * Layout written/maintained under `outRoot`:
  * {{{
  *   bronze/          partitioned by _ingestion_date (incremental axis)
  *   silver/          partitioned by _trade_date (mart pruning axis)
  *   ohlcv_1m/        partitioned by _partition_date
  *   ohlcv_1h/        partitioned by _partition_date
  *   daily_metrics/   partitioned by date (its grain)
  *   price_latest/    tiny serving table (unpartitioned)
  *   quality_report/  this run's checks (unpartitioned)
  *   _state/latest_trade/   |products|-row merge state for price_latest
  *   _watermark       max processed ingested_at (atomic marker file)
  * }}}
  */
object PipelineRun {

  /** Stage names in dependency order. */
  val Stages: Seq[String] =
    Seq("bronze", "silver", "ohlcv_1m", "ohlcv_1h", "daily_metrics",
      "price_latest", "quality_report")

  // ── stage machinery (shared by full + incremental) ──────────────────

  /** Per-run stage executor: retries + metrics-based row counts + the
    * run report. See the retry/metrics rationale on [[run]]. */
  private final class Runner(spark: SparkSession, outRoot: String,
                             retries: Int, backoffMs: Long) {
    private val report = Seq.newBuilder[(String, Long, String, Double, Int)]

    def stage(name: String)(write: String => Unit): DataFrame = {
      val path = s"$outRoot/$name"
      val t0 = System.nanoTime()
      var attempts = 0
      val rows = Retry.withRetries(retries, backoffMs, s"stage $name") {
        attempts += 1
        // metrics scoped per attempt AND per label: a failed partial
        // write's records never pollute the successful attempt's
        // count, and jobs from overlapped independent work (the
        // latest-trade state write back-filling this stage's
        // stragglers) are excluded by the description filter
        val (_, jobs) = Metrics.collectJobsLabelled(spark, name)(write(path))
        jobs.map(_.outputRecords).sum
      }
      report += ((name, rows, path, (System.nanoTime() - t0) / 1e9, attempts))
      spark.read.parquet(path)
    }

    def skipped(name: String): Unit =
      report += ((name, 0L, s"$outRoot/$name", 0.0, 0))

    def reportDF: DataFrame = {
      import spark.implicits._
      report.result().toDF("stage", "rows", "path", "seconds", "attempts")
    }
  }

  private def observedOr[T](spark: SparkSession,
                            obs: org.apache.spark.sql.Observation,
                            key: String)(fallback: => T): T =
    Metrics.observedOr(spark, obs, key)(fallback)

  /** Run `body` with dynamic partition overwrite on (only the written
    * partitions are replaced), restoring the previous mode after. */
  private def withDynamicOverwrite[A](spark: SparkSession)(body: => A): A = {
    val key = "spark.sql.sources.partitionOverwriteMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "dynamic")
    try body
    finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  /** Error-severity quality gate (shared by both modes): throws naming
    * the red checks; warn-severity checks report but never abort. */
  private def gate(quality: DataFrame, outRoot: String): Unit = {
    val red = quality.filter(col("violations") > 0)
      .select("table_name", "check_name").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .filterNot(DataQuality.warnChecks)
    if (red.nonEmpty)
      throw new IllegalStateException(
        s"quality gate failed: ${red.map(_._2).mkString(", ")} " +
          s"(report persisted at $outRoot/quality_report)")
  }

  // ── watermark marker (the incremental scheduler's state) ────────────

  private def watermarkPath(outRoot: String) = MetaIO.join(outRoot, "_watermark")

  /** The persisted high-water mark: max `ingested_at` processed by the
    * last run, or None before any full run. */
  def readWatermark(outRoot: String): Option[LocalDateTime] = {
    val p = watermarkPath(outRoot)
    if (MetaIO.exists(p)) Some(LocalDateTime.parse(MetaIO.readString(p).trim))
    else None
  }

  private def writeWatermark(outRoot: String, wm: LocalDateTime): Unit = {
    MetaIO.mkdirs(outRoot)
    MetaIO.publishString(watermarkPath(outRoot), wm.toString)
  }

  private val LatestTradeState = "_state/latest_trade"

  // ── full rebuild ────────────────────────────────────────────────────

  /** Run the full chain from the raw events at `sfDir` into
    * `outRoot/<stage>/`, returning the run report: one row per stage
    * with row count, output path, wall seconds, and attempts. Throws
    * `IllegalStateException` naming the failing checks if the quality
    * gate is red and `failOnViolations` is set (the report is written
    * either way).
    *
    * Each stage write carries the reference DAG's task resilience
    * (`default_args` retries + exponential backoff,
    * `orchestration/dags/bronze_to_silver.py:20-35`): a transient
    * failure re-runs the idempotent overwrite up to `retries` more
    * times; the quality GATE is deliberately outside the retry (a red
    * check is deterministic data, not a transient fault). Stage row
    * counts come from the scheduler-bus output metrics of the write
    * job itself ([[Metrics.collectJobs]]) — never a second scan of
    * what was just written, which at 100 TB would double the run's
    * read cost for a report field. */
  def run(spark: SparkSession, sfDir: String, outRoot: String,
          failOnViolations: Boolean = true,
          eventsOverride: Option[DataFrame] = None,
          retries: Int = 2, retryBackoffMs: Long = 1000L): DataFrame = {
    val r = new Runner(spark, outRoot, retries, retryBackoffMs)

    // bronze: raw ingest with redelivered duplicates, partitioned by
    // ingestion date (the incremental-read axis). The incremental
    // scheduler's watermark (max ingested_at) rides the WRITE job as an
    // observed metric — no separate bronze re-scan job for one scalar.
    val wmObs = new org.apache.spark.sql.Observation()
    // the observed frame is built ONCE outside the retry closure: an
    // Observation binds to one Dataset, and a retried attempt re-writes
    // the same frame rather than re-registering the observation
    val bronzeDf = Bronze.withRedeliveries(Bronze.ingest(
        eventsOverride.getOrElse(Tables.events(spark, sfDir))))
      .observe(wmObs, max(col("ingested_at")).as("wm"))
    val bronze = r.stage("bronze") { p =>
      Bronze.writePartitioned(bronzeDf, p)
    }
    // silver: dedup + typed transform, partitioned by trade date (the
    // mart consumers' pruning axis). Everything downstream reads THIS
    // materialization — the chain above never re-executes.
    val silver = r.stage("silver") { p =>
      BronzeToSilver.writePartitioned(BronzeToSilver.transform(bronze), p)
    }
    val stg = Staging.stgTrades(silver)
    // latest-trade merge state (|products| rows): the incremental
    // runner's price_latest base — not a report stage, just state.
    // It depends only on the silver materialization, NOT on the candle
    // marts, so it runs CONCURRENTLY with the m1→h1→dm chain (guide
    // §2.6: overlap independent jobs so the state write's tasks
    // back-fill executors idling in the mart stages' shuffle tails).
    // Stage row counts stay exact: the Runner's collectJobsLabelled
    // attributes by job description, and this thread writes under its
    // own label.
    @volatile var stateErr: Throwable = null
    val stateThread = new Thread(() => {
      try {
        org.apache.spark.sql.SparkSession.setActiveSession(spark)
        spark.sparkContext.setJobDescription("latest_trade_state")
        PriceLatest.latestTradeOf(stg).write.mode("overwrite")
          .parquet(s"$outRoot/$LatestTradeState")
      } catch { case t: Throwable => stateErr = t }
    }, "graft-latest-trade-state")
    stateThread.start()
    // marts are repartitioned ON the partition column before the write:
    // without it every write task emits a file into every date dir
    // (tasks × dates small files — the layout that kills object-store
    // listings at scale); with it each date lands as one right-sized
    // file, and the extra shuffle moves only already-reduced candles
    val m1 = r.stage("ohlcv_1m") { p =>
      Ohlcv.ohlcv1m(stg).repartition(col("_partition_date"))
        .write.mode("overwrite").partitionBy("_partition_date").parquet(p)
    }
    val h1 = r.stage("ohlcv_1h") { p =>
      Ohlcv.ohlcv1h(m1).repartition(col("_partition_date"))
        .write.mode("overwrite").partitionBy("_partition_date").parquet(p)
    }
    // day-partitioned (its grain): incremental runs rewrite only the
    // touched days, and the serving table's 24 h horizon lookup prunes
    // to two date dirs instead of a whole month
    val dm = r.stage("daily_metrics") { p =>
      DailyMetrics.daily(h1).repartition(col("date"))
        .write.mode("overwrite").partitionBy("date").parquet(p)
    }
    stateThread.join()
    if (stateErr != null) throw stateErr
    val pl = r.stage("price_latest") { p =>
      PriceLatest.serve(spark.read.parquet(s"$outRoot/$LatestTradeState"),
        m1, h1, dm).write.mode("overwrite").parquet(p)
    }
    val quality = r.stage("quality_report") { p =>
      DataQuality.fullReport(bronze, silver, m1, h1, dm, pl)
        .write.mode("overwrite").parquet(p)
    }

    if (failOnViolations) gate(quality, outRoot)

    // the incremental scheduler's starting point: everything ingested
    // up to here is processed — read from the bronze write's observed
    // metric, with the old one-column re-scan as the defensive fallback
    val wm = observedOr[LocalDateTime](spark, wmObs, "wm")(
      bronze.agg(max("ingested_at")).head().getAs[LocalDateTime](0))
    if (wm != null) writeWatermark(outRoot, wm)

    // health history: this run's report joins the persisted time
    // series (one tiny driver-local write — see MetricsHistory)
    MetricsHistory.append(spark, outRoot, r.reportDF, "full", Option(wm))
    r.reportDF
  }

  // ── incremental run ─────────────────────────────────────────────────

  /** Process ONLY the new raw events against an `outRoot` previously
    * built by [[run]] — the reference's scheduled 30-minute mode
    * (`bronze_to_silver.py:74-91` + the DAG). Semantics:
    *
    *  1. append `newEvents`' bronze rows to `bronze/` (new
    *     `_ingestion_date` partitions or additions to existing ones);
    *  2. re-read bronze rows with `ingested_at > watermark − lookback`
    *     — a partition-pruned scan of the tail, never the table; the
    *     lookback overlap re-admits late redeliveries and makes a
    *     crashed-then-rerun window safe;
    *  3. MERGE the transformed batch into `silver/` with keep-earliest
    *     conflict resolution ([[MergeUpsert.mergeKeepFirst]]) — only
    *     the `_trade_date` partitions the batch touches are read
    *     (pruned slice) and rewritten (dynamic partition overwrite),
    *     so a sequence of incremental runs lands bit-identical to one
    *     full rebuild;
    *  4. recompute candle marts for the touched dates only (hourly
    *     and minute candles are date-local, daily metrics month-local
    *     — each slice rewrite is exact) and the tiny serving /
    *     quality tables from pruned inputs + merge state;
    *  5. gate on quality over THIS run's slices, then advance the
    *     watermark (atomic marker move — a failed run never advances
    *     it, so the next run re-covers the window).
    *
    * The per-run `collect`s are planning-time metadata only (the
    * touched-date list and the as-of timestamp — ≤ days × 1 rows), the
    * same watermark-resolution step every incremental table format
    * performs from snapshot metadata.
    *
    * Assumption (holds for the trade model, and for any fact table):
    * a row's partition date is a function of its key — a key never
    * moves between date partitions, so partition-scoped MERGE is
    * exact. */
  def runIncremental(spark: SparkSession, outRoot: String,
                     newEvents: DataFrame, lookbackHours: Int = 2,
                     failOnViolations: Boolean = true,
                     retries: Int = 2, retryBackoffMs: Long = 1000L): DataFrame = {
    val prevWm = readWatermark(outRoot).getOrElse(throw new IllegalStateException(
      s"no _watermark at $outRoot — bootstrap with PipelineRun.run first"))
    val r = new Runner(spark, outRoot, retries, retryBackoffMs)

    val ingestNew = Bronze.withRedeliveries(Bronze.ingest(newEvents)).persist()
    // the advanced watermark (max ingested_at of the batch) rides the
    // bronze append's write job as an observed metric — one scalar
    // must not cost its own job
    val wmObs = new org.apache.spark.sql.Observation()
    val ingestNewObs = ingestNew
      .observe(wmObs, max(col("ingested_at")).as("wm"))
    r.stage("bronze") { p =>
      Bronze.writePartitioned(ingestNewObs, p, mode = "append") }

    // the incremental window: watermark minus late-arrival lookback,
    // resolved to literals so the bronze scan partition-prunes
    val cutoff = prevWm.minusHours(lookbackHours.toLong)
    val batchSilver = BronzeToSilver.transform(
      spark.read.parquet(s"$outRoot/bronze")
        .filter(col("_ingestion_date") >= lit(java.sql.Date.valueOf(cutoff.toLocalDate))
          && col("ingested_at") > lit(cutoff))).persist()

    // touched partitions — planning-time metadata (≤ touched days)
    val affectedDates = batchSilver.select("_trade_date").distinct()
      .collect().map(_.getDate(0)).sortBy(_.toString).toSeq

    if (affectedDates.isEmpty) {
      // empty window: nothing to merge; report the (empty) append only
      Stages.drop(1).foreach(r.skipped)
      ingestNew.unpersist(); batchSilver.unpersist()
      return r.reportDF
    }
    val dateLits = affectedDates.map(lit(_))

    // 3. silver: keep-earliest MERGE over the touched slice; dynamic
    // overwrite rewrites only those partitions. localCheckpoint
    // materializes the merged slice before the overwrite (plain
    // parquet cannot read and overwrite the same path in one job —
    // an ACID format's write-new-files-then-commit hides this).
    r.stage("silver") { p =>
      val targetSlice = spark.read.parquet(p)
        .filter(col("_trade_date").isin(dateLits: _*))
      val merged = MergeUpsert.mergeKeepFirst(targetSlice,
        batchSilver.select(targetSlice.columns.map(col(_)).toSeq: _*),
        "trade_id", Seq(col("ingested_at")))
      withDynamicOverwrite(spark) {
        merged.localCheckpoint().write.mode("overwrite")
          .partitionBy("_trade_date").parquet(p)
      }
    }
    val silverSlice = spark.read.parquet(s"$outRoot/silver")
      .filter(col("_trade_date").isin(dateLits: _*))
    val stgSlice = Staging.stgTrades(silverSlice)

    // 4. marts: candles are date-local, so the touched-date slices are
    // exactly the full-rebuild values for those dates
    val m1Slice = r.stage("ohlcv_1m") { p =>
      withDynamicOverwrite(spark) {
        Ohlcv.ohlcv1m(stgSlice).repartition(col("_partition_date"))
          .write.mode("overwrite").partitionBy("_partition_date").parquet(p)
      }
    }.filter(col("_partition_date").isin(dateLits: _*))
    val h1Slice = r.stage("ohlcv_1h") { p =>
      withDynamicOverwrite(spark) {
        Ohlcv.ohlcv1h(m1Slice).repartition(col("_partition_date"))
          .write.mode("overwrite").partitionBy("_partition_date").parquet(p)
      }
    }.filter(col("_partition_date").isin(dateLits: _*))
    // daily metrics are day-grain and day-partitioned: the touched
    // days recompute from the already-rewritten hourly slice alone
    val dmSlice = r.stage("daily_metrics") { p =>
      withDynamicOverwrite(spark) {
        DailyMetrics.daily(h1Slice).repartition(col("date"))
          .write.mode("overwrite").partitionBy("date").parquet(p)
      }
    }.filter(col("date").isin(dateLits: _*))

    // price_latest: merge the |products|-row latest-trade state with
    // the batch (keep-max by time,id), then serve from candle slices
    // pruned to the horizon window (~25 h) before as-of — exact, and
    // nothing here scans beyond the state + the recent partitions
    val ltPath = s"$outRoot/$LatestTradeState"
    val newState = MergeUpsert.mergeKeepFirst(
      spark.read.parquet(ltPath),
      PriceLatest.latestTradeOf(Staging.stgTrades(batchSilver)),
      "product_id", Seq(col("updated_at").desc, col("trade_id").desc))
      .localCheckpoint()
    // the serve horizon's as-of scalar rides the state write's job as
    // an observed metric instead of a separate aggregate job
    val asOfObs = new org.apache.spark.sql.Observation()
    newState.observe(asOfObs, max(col("updated_at")).as("as_of"))
      .write.mode("overwrite").parquet(ltPath)
    val asOf = observedOr[LocalDateTime](spark, asOfObs, "as_of")(
      newState.agg(max("updated_at")).head().getAs[LocalDateTime](0))
    val horizonLb = lit(java.sql.Date.valueOf(asOf.toLocalDate.minusDays(1)))
    val pl = r.stage("price_latest") { p =>
      PriceLatest.serve(
        spark.read.parquet(ltPath),
        spark.read.parquet(s"$outRoot/ohlcv_1m")
          .filter(col("_partition_date") >= horizonLb),
        spark.read.parquet(s"$outRoot/ohlcv_1h")
          .filter(col("_partition_date") >= horizonLb),
        spark.read.parquet(s"$outRoot/daily_metrics")
          .filter(col("date") >= horizonLb))
        .write.mode("overwrite").parquet(p)
    }

    // 5. quality over THIS run's slices (the incremental DQ scope:
    // check what the run touched, not the whole history every 30 min)
    val batchBronze = spark.read.parquet(s"$outRoot/bronze")
      .filter(col("_ingestion_date") >= lit(java.sql.Date.valueOf(cutoff.toLocalDate))
        && col("ingested_at") > lit(cutoff))
    val quality = r.stage("quality_report") { p =>
      DataQuality.fullReport(batchBronze, silverSlice, m1Slice, h1Slice,
        dmSlice, pl).write.mode("overwrite").parquet(p)
    }
    if (failOnViolations) gate(quality, outRoot)

    val newWm = observedOr[LocalDateTime](spark, wmObs, "wm")(
      ingestNew.agg(max("ingested_at")).head().getAs[LocalDateTime](0))
    ingestNew.unpersist(); batchSilver.unpersist()
    if (newWm != null && newWm.isAfter(prevWm)) writeWatermark(outRoot, newWm)

    MetricsHistory.append(spark, outRoot, r.reportDF, "incremental",
      Option(if (newWm != null && newWm.isAfter(prevWm)) newWm else prevWm))
    r.reportDF
  }
}
