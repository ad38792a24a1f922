package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations → violations report.
  *
  * Re-expresses the reference's quality surface Spark-native:
  *  - Great Expectations suites per layer
  *    (`quality/great_expectations/expectations/bronze_trades_suite.json`,
  *    `silver_trades_suite.json`, orchestrated by
  *    `orchestration/dags/data_quality.py:30-71`), including the
  *    ordered-schema expectation (`bronze_trades_suite.json:9`
  *    `expect_table_columns_to_match_ordered_list`);
  *  - dbt mart tests (`processing/dbt/models/marts/schema.yml`:
  *    not_null/unique on ohlcv_1m, ohlcv_1h, daily_metrics,
  *    price_latest) as gold-layer checks;
  *  - a deterministic freshness check (per-product staleness against
  *    the globally newest trade — the deterministic analog of the
  *    reference DAG's hourly wall-clock gate).
  *
  * Each row expectation becomes one conditional aggregate, evaluated in
  * a single pass per table (one scan computes every check via
  * SUM(CASE WHEN violation)); the report is the union of per-check rows.
  *
  * Each check carries BOTH its Spark violation aggregate and the
  * equivalent DuckDB SQL, so the oracle (graft.Oracles) renders from
  * the same definition — the two sides cannot drift.
  *
  * Scale: N checks per table cost one scan + a width-N partial
  * aggregate, not N scans; uniqueness is a count-distinct on the key
  * (exact, single shuffle); the freshness pre-aggregate reduces to
  * |products| rows before its global comparison.
  */
object DataQuality {

  /** One expectation: name + Spark violation aggregate (given the
    * table's DataFrame) + DuckDB mirror (given the source relation
    * name). `warn` marks advisory severity (dbt `severity: warn`):
    * the check still reports violations, but a pipeline gate
    * ([[PipelineRun]]) only aborts on error-severity checks. */
  case class CheckDef(name: String, violations: DataFrame => Column,
                      duck: String => String, warn: Boolean = false)

  /** (table_name, check_name) pairs carrying warn severity — derived
    * from the suite definitions below, used by gates to decide what is
    * fatal. The report SCHEMA is unchanged (oracle compatibility);
    * severity is a property of the suite, not of a run. */
  lazy val warnChecks: Set[(String, String)] =
    (bronzeChecks.filter(_.warn).map(("bronze_trades", _)) ++
      silverChecks.filter(_.warn).map(("silver_trades", _)))
      .map { case (t, c) => (t, c.name) }.toSet

  private def notNull(c: String) = CheckDef(s"not_null_$c",
    _ => sum(when(col(c).isNull, 1L).otherwise(0L)),
    _ => s"SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)")

  private def inSet(c: String, values: Seq[String]) = CheckDef(s"in_set_$c",
    _ => sum(when(!col(c).isin(values: _*) || col(c).isNull, 1L).otherwise(0L)),
    _ => s"SUM(CASE WHEN $c IS NULL OR $c NOT IN (${values.map(v => s"'$v'").mkString(", ")}) THEN 1 ELSE 0 END)")

  private def positive(c: String) = CheckDef(s"positive_$c",
    _ => sum(when(col(c) <= 0 || col(c).isNull, 1L).otherwise(0L)),
    _ => s"SUM(CASE WHEN $c IS NULL OR $c <= 0 THEN 1 ELSE 0 END)")

  private def nonNegative(c: String) = CheckDef(s"non_negative_$c",
    _ => sum(when(col(c) < 0, 1L).otherwise(0L)),
    _ => s"SUM(CASE WHEN $c < 0 THEN 1 ELSE 0 END)")

  private def unique(c: String) = CheckDef(s"unique_$c",
    _ => count(lit(1)) - countDistinct(col(c)),
    _ => s"COUNT(*) - COUNT(DISTINCT $c)")

  /** Composite-key uniqueness (the dbt mart-grain test). Keys are
    * non-null by construction here, so Spark's multi-column
    * countDistinct and DuckDB's COUNT(DISTINCT (row)) agree. */
  private def uniqueGrain(c1: String, c2: String) = CheckDef(s"unique_${c1}_$c2",
    _ => count(lit(1)) - countDistinct(col(c1), col(c2)),
    _ => s"COUNT(*) - COUNT(DISTINCT ($c1, $c2))")

  /** `expect_table_columns_to_match_ordered_list`
    * (`bronze_trades_suite.json:9`): the table's ordered column list
    * must equal `expected`. Schema is metadata, so the Spark side
    * resolves at plan time from `df.columns`; the DuckDB side
    * introspects the same relation with DESCRIBE in a scalar
    * subquery. */
  def schemaCheck(expected: Seq[String]) = CheckDef("schema_ordered_columns",
    df => max(lit(if (df.columns.toSeq == expected) 0L else 1L)),
    // aggregate input order is unspecified SQL, so the column order is
    // made explicit: stamp DESCRIBE's row order with row_number() and
    // ORDER BY it inside string_agg (not reliant on DuckDB happening to
    // preserve DESCRIBE order through an unordered aggregate)
    src => s"MAX(CASE WHEN (SELECT string_agg(column_name, ',' ORDER BY ordinal) " +
      s"FROM (SELECT column_name, row_number() OVER () AS ordinal " +
      s"FROM (DESCRIBE SELECT * FROM $src))) = '${expected.mkString(",")}' " +
      "THEN 0 ELSE 1 END)")

  val Products = Seq("click", "error", "purchase", "signup", "view")

  /** Bronze schema contract — [[Bronze.ingest]]'s output order. */
  val BronzeColumns = Seq("trade_id", "product_id", "price", "size", "side",
    "trade_time", "ingested_at", "_raw_payload", "_ingestion_date")

  /** Silver schema contract — [[BronzeToSilver.transform]]'s output order. */
  val SilverColumns = Seq("trade_id", "product_id", "price", "size", "side",
    "trade_time", "ingested_at", "_is_late_arrival", "_source_latency_ms",
    "_trade_date")

  /** Bronze-layer suite (bronze_trades_suite.json). */
  val bronzeChecks: Seq[CheckDef] = Seq(
    schemaCheck(BronzeColumns),
    notNull("trade_id"),
    notNull("ingested_at"),
    notNull("product_id"),
    inSet("product_id", Products),
    notNull("price"),
    notNull("size"),
    inSet("side", Seq("buy", "sell")),
    notNull("_raw_payload"))

  /** Silver-layer suite (silver_trades_suite.json + staging/schema.yml
    * source tests); uniqueness of trade_id is (rows − distinct keys),
    * folded into the same single-pass aggregate. */
  val silverChecks: Seq[CheckDef] = Seq(
    schemaCheck(SilverColumns),
    notNull("trade_id"),
    unique("trade_id"),
    notNull("product_id"),
    inSet("product_id", Products),
    notNull("price"),
    // silver is pre-filter: staging (stg_trades) drops non-positive
    // prices/sizes downstream, so at THIS layer positivity is a
    // warn-severity source test (raw feeds do contain zero-size
    // prints), not a pipeline-fatal error
    positive("price").copy(warn = true),
    notNull("size"),
    positive("size").copy(warn = true),
    inSet("side", Seq("buy", "sell")),
    notNull("trade_time"),
    nonNegative("_source_latency_ms"))

  /** Gold-layer mart suites (`processing/dbt/models/marts/schema.yml`). */
  val ohlcvChecks: Seq[CheckDef] = Seq(
    notNull("product_id"), notNull("window_start"),
    uniqueGrain("product_id", "window_start"))

  val dailyMetricsChecks: Seq[CheckDef] = Seq(
    notNull("product_id"), notNull("date"),
    uniqueGrain("product_id", "date"))

  val priceLatestChecks: Seq[CheckDef] = Seq(
    notNull("product_id"), unique("product_id"), notNull("price"))

  private[graft] def report(table: String, df: DataFrame, checks: Seq[CheckDef]): DataFrame =
    df.agg(
        count(lit(1)).as("row_count"),
        checks.map(c => c.violations(df).as(c.name)): _*)
      // one scan → one agg row → explode into one row per check
      .select(col("row_count"), explode(array(checks.map(c =>
        struct(lit(c.name).as("check_name"),
               col(c.name).cast("long").as("violations"))): _*)).as("chk"))
      .select(
        lit(table).as("table_name"),
        col("chk.check_name").as("check_name"),
        col("row_count"),
        col("chk.violations").as("violations"),
        (col("chk.violations") === 0).as("passed"))

  def bronzeReport(bronze: DataFrame): DataFrame =
    report("bronze_trades", bronze, bronzeChecks)

  def silverReport(silver: DataFrame): DataFrame =
    report("silver_trades", silver, silverChecks)

  /** Freshness: products whose latest trade lags more than
    * `maxLagHours` behind the globally newest trade. Deterministic
    * (anchored to data, not wall clock); `row_count` is the number of
    * products assessed. The per-product pre-aggregate is one shuffle
    * reducing to |products| rows; the global max is a 1-row aggregate
    * broadcast back onto that tiny result (no single-partition global
    * window anywhere in the plan). */
  def freshnessReport(silver: DataFrame, maxLagHours: Int = 24): DataFrame = {
    val per = silver.groupBy("product_id").agg(max("trade_time").as("latest"))
    per
      .crossJoin(broadcast(per.agg(max("latest").as("global_latest"))))
      .agg(
        count(lit(1)).as("row_count"),
        sum(when(expr(s"latest < timestampadd(HOUR, -$maxLagHours, global_latest)"),
          1L).otherwise(0L)).as("violations"))
      .select(
        lit("silver_trades").as("table_name"),
        lit(s"freshness_products_${maxLagHours}h").as("check_name"),
        col("row_count"),
        col("violations"),
        (col("violations") === 0).as("passed"))
  }

  /** The full lakehouse quality report: bronze + silver suites,
    * freshness, and the gold mart tests. */
  def fullReport(bronze: DataFrame, silver: DataFrame, m1: DataFrame,
                 h1: DataFrame, dm: DataFrame, priceLatest: DataFrame): DataFrame =
    bronzeReport(bronze)
      .unionByName(silverReport(silver))
      .unionByName(freshnessReport(silver))
      .unionByName(report("ohlcv_1m", m1, ohlcvChecks))
      .unionByName(report("ohlcv_1h", h1, ohlcvChecks))
      .unionByName(report("daily_metrics", dm, dailyMetricsChecks))
      .unionByName(report("price_latest", priceLatest, priceLatestChecks))
}
