package graft.operators

import org.apache.spark.sql.DataFrame
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
  * Scale: N checks per table cost one scan + a width-N partial
  * aggregate, not N scans; uniqueness is a count-distinct on the key
  * (exact, single shuffle).
  */
object DataQuality {

  private case class Check(name: String, violations: org.apache.spark.sql.Column)

  private def report(table: String, df: DataFrame, checks: Seq[Check]): DataFrame =
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

  private def notNull(c: String) =
    Check(s"not_null_$c", sum(when(col(c).isNull, 1L).otherwise(0L)))
  private def inSet(c: String, values: Seq[String]) =
    Check(s"in_set_$c",
      sum(when(!col(c).isin(values: _*) || col(c).isNull, 1L).otherwise(0L)))
  private def positive(c: String) =
    Check(s"positive_$c", sum(when(col(c) <= 0 || col(c).isNull, 1L).otherwise(0L)))
  private def nonNegative(c: String) =
    Check(s"non_negative_$c", sum(when(col(c) < 0, 1L).otherwise(0L)))

  private val Products = Seq("click", "error", "purchase", "signup", "view")

  /** Bronze-layer suite (bronze_trades_suite.json). */
  def bronzeReport(bronze: DataFrame): DataFrame =
    report("bronze_trades", bronze, Seq(
      notNull("trade_id"),
      notNull("ingested_at"),
      notNull("product_id"),
      inSet("product_id", Products),
      notNull("price"),
      notNull("size"),
      inSet("side", Seq("buy", "sell")),
      notNull("_raw_payload")))

  /** Silver-layer suite (silver_trades_suite.json). Uniqueness of
    * trade_id is (rows - distinct keys), folded into the same
    * single-pass aggregate. */
  def silverReport(silver: DataFrame): DataFrame =
    report("silver_trades", silver, Seq(
      notNull("trade_id"),
      Check("unique_trade_id", count(lit(1)) - countDistinct(col("trade_id"))),
      notNull("product_id"),
      inSet("product_id", Products),
      notNull("price"),
      positive("price"),
      notNull("size"),
      positive("size"),
      inSet("side", Seq("buy", "sell")),
      notNull("trade_time"),
      nonNegative("_source_latency_ms")))

  def fullReport(bronze: DataFrame, silver: DataFrame): DataFrame =
    bronzeReport(bronze).unionByName(silverReport(silver))
}
