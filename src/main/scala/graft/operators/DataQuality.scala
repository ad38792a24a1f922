package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations → violations report.
  *
  * Re-expresses the Great Expectations suites the reference runs per
  * layer (`quality/great_expectations/expectations/bronze_trades_suite
  * .json`, `silver_trades_suite.json`, orchestrated by
  * `orchestration/dags/data_quality.py:30-71`) as Spark-native
  * aggregation checks: each expectation becomes one conditional
  * aggregate, evaluated in a single pass per table (one scan computes
  * every check via SUM(CASE WHEN violation)), and the report is the
  * union of per-check rows.
  *
  * Each check carries BOTH its Spark violation aggregate and the
  * equivalent DuckDB SQL, so the oracle (graft.Oracles) renders from
  * the same definition — the two sides cannot drift.
  *
  * Scale: N checks per table cost one scan + a width-N partial
  * aggregate, not N scans; uniqueness is a count-distinct on the key
  * (exact, single shuffle).
  */
object DataQuality {

  /** One expectation: name + Spark violation count + DuckDB mirror. */
  case class CheckDef(name: String, violations: Column, duck: String)

  private def notNull(c: String) = CheckDef(s"not_null_$c",
    sum(when(col(c).isNull, 1L).otherwise(0L)),
    s"SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END)")

  private def inSet(c: String, values: Seq[String]) = CheckDef(s"in_set_$c",
    sum(when(!col(c).isin(values: _*) || col(c).isNull, 1L).otherwise(0L)),
    s"SUM(CASE WHEN $c IS NULL OR $c NOT IN (${values.map(v => s"'$v'").mkString(", ")}) THEN 1 ELSE 0 END)")

  private def positive(c: String) = CheckDef(s"positive_$c",
    sum(when(col(c) <= 0 || col(c).isNull, 1L).otherwise(0L)),
    s"SUM(CASE WHEN $c IS NULL OR $c <= 0 THEN 1 ELSE 0 END)")

  private def nonNegative(c: String) = CheckDef(s"non_negative_$c",
    sum(when(col(c) < 0, 1L).otherwise(0L)),
    s"SUM(CASE WHEN $c < 0 THEN 1 ELSE 0 END)")

  val Products = Seq("click", "error", "purchase", "signup", "view")

  /** Bronze-layer suite (bronze_trades_suite.json). */
  val bronzeChecks: Seq[CheckDef] = Seq(
    notNull("trade_id"),
    notNull("ingested_at"),
    notNull("product_id"),
    inSet("product_id", Products),
    notNull("price"),
    notNull("size"),
    inSet("side", Seq("buy", "sell")),
    notNull("_raw_payload"))

  /** Silver-layer suite (silver_trades_suite.json); uniqueness of
    * trade_id is (rows − distinct keys), folded into the same
    * single-pass aggregate. */
  val silverChecks: Seq[CheckDef] = Seq(
    notNull("trade_id"),
    CheckDef("unique_trade_id",
      count(lit(1)) - countDistinct(col("trade_id")),
      "COUNT(*) - COUNT(DISTINCT trade_id)"),
    notNull("product_id"),
    inSet("product_id", Products),
    notNull("price"),
    positive("price"),
    notNull("size"),
    positive("size"),
    inSet("side", Seq("buy", "sell")),
    notNull("trade_time"),
    nonNegative("_source_latency_ms"))

  private def report(table: String, df: DataFrame, checks: Seq[CheckDef]): DataFrame =
    df.agg(
        count(lit(1)).as("row_count"),
        checks.map(c => c.violations.as(c.name)): _*)
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

  def fullReport(bronze: DataFrame, silver: DataFrame): DataFrame =
    bronzeReport(bronze).unionByName(silverReport(silver))
}
