package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.ScdTwo

/** SCD Type-2 maintenance: changed attributes close and reopen
  * versions at the batch timestamp, unchanged rows are no-ops even
  * with newer timestamps, null transitions are tracked null-safely,
  * and as-of reads resolve the covering version. */
class ScdTwoSpec extends GraftSuite {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val t1 = ts("2024-01-01 00:00:00")
  private val t2 = ts("2024-01-02 00:00:00")
  private val t3 = ts("2024-01-03 00:00:00")

  private def dim0 = ScdTwo.init(
    Seq(("k1", "gold", t1), ("k2", "silver", t1))
      .toDF("id", "tier", "updated_at"), "updated_at")

  test("merge closes changed versions, ignores timestamp-only changes, opens new keys") {
    val batch = Seq(
      ("k1", "gold", t2), // unchanged attr, newer ts -> no-op
      ("k2", "bronze", t2), // changed -> close + open
      ("k3", "gold", t2)) // new key -> open
      .toDF("id", "tier", "updated_at")
    val got = ScdTwo.merge(dim0, batch, "id", "updated_at")
      .select("id", "tier", "valid_from", "valid_to", "is_current")
      .as[(String, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSet
    assert(got === Set(
      ("k1", "gold", t1, None, true),
      ("k2", "silver", t1, Some(t2), false),
      ("k2", "bronze", t2, None, true),
      ("k3", "gold", t2, None, true)))
  }

  test("a reverted value opens a THIRD version; keys absent from a batch survive") {
    val batch2 = Seq(("k2", "bronze", t2)).toDF("id", "tier", "updated_at")
    val d1 = ScdTwo.merge(dim0, batch2, "id", "updated_at")
    val batch3 = Seq(("k2", "silver", t3)).toDF("id", "tier", "updated_at")
    val d2 = ScdTwo.merge(d1, batch3, "id", "updated_at")
    val k2 = d2.filter(col("id") === "k2")
      .select("id", "tier", "valid_from", "valid_to", "is_current")
      .as[(String, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSet
    assert(k2 === Set(
      ("k2", "silver", t1, Some(t2), false),
      ("k2", "bronze", t2, Some(t3), false),
      ("k2", "silver", t3, None, true)))
    // k1 untouched through both merges
    assert(d2.filter(col("id") === "k1" && col("is_current")).count() === 1)
  }

  test("null attribute transitions version null-safely in both directions") {
    val d0 = ScdTwo.init(Seq(("k1", Option.empty[String], t1))
      .toDF("id", "tier", "updated_at"), "updated_at")
    val d1 = ScdTwo.merge(d0,
      Seq(("k1", Option("gold"), t2)).toDF("id", "tier", "updated_at"),
      "id", "updated_at")
    val d2 = ScdTwo.merge(d1,
      Seq(("k1", Option.empty[String], t3)).toDF("id", "tier", "updated_at"),
      "id", "updated_at")
    assert(d2.count() === 3)
    assert(d2.filter(col("is_current")).select("tier")
      .as[Option[String]].head() === None)
    // null -> null is a no-op
    val d3 = ScdTwo.merge(d2,
      Seq(("k1", Option.empty[String], ts("2024-01-04 00:00:00")))
        .toDF("id", "tier", "updated_at"), "id", "updated_at")
    assert(d3.count() === 3)
  }

  test("asOf resolves the covering version at any instant") {
    val d1 = ScdTwo.merge(dim0,
      Seq(("k2", "bronze", t2)).toDF("id", "tier", "updated_at"),
      "id", "updated_at")
    def tierAt(t: Timestamp): String =
      ScdTwo.asOf(d1, t).filter(col("id") === "k2")
        .select("tier").as[String].head()
    assert(tierAt(ts("2024-01-01 12:00:00")) === "silver")
    assert(tierAt(t2) === "bronze") // valid_from inclusive
    assert(tierAt(ts("2024-01-09 00:00:00")) === "bronze")
    // before the first version: no row
    assert(ScdTwo.asOf(d1, ts("2023-12-31 00:00:00"))
      .filter(col("id") === "k2").count() === 0)
  }
}
