package graft.operators

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
  * Ordering and failure semantics match the DAG: stages run in
  * dependency order, the quality gate runs LAST over every
  * materialized table, and `failOnViolations` makes a red check abort
  * the run with the failing check names (the DAG's fail-fast task),
  * AFTER the report itself is persisted for debugging.
  *
  * Scale: each arrow is one distributed job whose shuffle keys are the
  * mart's group-by keys; silver is written partitioned by trade date
  * (`_trade_date`), so every downstream consumer prunes to the dates
  * it touches and an incremental rerun overwrites only new partitions.
  */
object PipelineRun {

  /** Stage names in dependency order. */
  val Stages: Seq[String] =
    Seq("bronze", "silver", "ohlcv_1m", "ohlcv_1h", "daily_metrics",
      "price_latest", "quality_report")

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
    val report = Seq.newBuilder[(String, Long, String, Double, Int)]

    def stage(name: String)(write: String => Unit): DataFrame = {
      val path = s"$outRoot/$name"
      val t0 = System.nanoTime()
      var attempts = 0
      val rows = Retry.withRetries(retries, retryBackoffMs, s"stage $name") {
        attempts += 1
        // metrics scoped per attempt: a failed partial write's records
        // never pollute the successful attempt's count
        val (_, jobs) = Metrics.collectJobs(spark, name)(write(path))
        jobs.map(_.outputRecords).sum
      }
      report += ((name, rows, path, (System.nanoTime() - t0) / 1e9, attempts))
      spark.read.parquet(path)
    }

    // bronze: raw ingest with redelivered duplicates, partitioned by
    // ingestion date (the incremental-read axis)
    val bronze = stage("bronze") { p =>
      val events = eventsOverride.getOrElse(Tables.events(spark, sfDir))
      Bronze.writePartitioned(
        Bronze.withRedeliveries(Bronze.ingest(events)), p)
    }
    // silver: dedup + typed transform, partitioned by trade date (the
    // mart consumers' pruning axis). Everything downstream reads THIS
    // materialization — the chain above never re-executes.
    val silver = stage("silver") { p =>
      BronzeToSilver.writePartitioned(BronzeToSilver.transform(bronze), p)
    }
    val stg = Staging.stgTrades(silver)
    val m1 = stage("ohlcv_1m") { p =>
      Ohlcv.ohlcv1m(stg).write.mode("overwrite").parquet(p)
    }
    val h1 = stage("ohlcv_1h") { p =>
      Ohlcv.ohlcv1h(m1).write.mode("overwrite").parquet(p)
    }
    val dm = stage("daily_metrics") { p =>
      DailyMetrics.daily(h1).write.mode("overwrite").parquet(p)
    }
    val pl = stage("price_latest") { p =>
      PriceLatest.latest(stg, m1, h1, dm).write.mode("overwrite").parquet(p)
    }
    val quality = stage("quality_report") { p =>
      DataQuality.fullReport(bronze, silver, m1, h1, dm, pl)
        .write.mode("overwrite").parquet(p)
    }

    if (failOnViolations) {
      // error-severity only: warn-severity checks (dbt severity: warn —
      // e.g. silver-layer positivity that staging filters downstream)
      // report but never abort the run
      val red = quality.filter(col("violations") > 0)
        .select("table_name", "check_name").collect()
        .map(r => (r.getString(0), r.getString(1)))
        .filterNot(DataQuality.warnChecks)
      if (red.nonEmpty)
        throw new IllegalStateException(
          s"quality gate failed: ${red.map(_._2).mkString(", ")} " +
            s"(report persisted at $outRoot/quality_report)")
    }

    import spark.implicits._
    report.result()
      .toDF("stage", "rows", "path", "seconds", "attempts")
  }
}
