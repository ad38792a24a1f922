package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout
import graft.sources.Tables

/** Physical layout: bucketed co-located joins and salted skew joins. */
class LayoutSpec extends GraftSuite {

  test("bucketed join plans without a shuffle exchange") {
    val orders = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    Layout.writeBucketed(orders, "orders_b", "o_orderkey", 4)
    Layout.writeBucketed(
      li.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b",
      "o_orderkey", 4)
    // disable auto-broadcast so the co-located SMJ (not a broadcast
    // join) is what gets planned — that's the shape a 100 TB fact-fact
    // join takes, where neither side broadcasts
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Layout.bucketedJoin(spark, "orders_b", "lineitem_b", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() === li.count())
    } finally
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted join returns exactly the plain join's rows") {
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_quantity")
    val ord = Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(ord, "l_orderkey")
    val salted = Layout.saltedJoin(li, ord, "l_orderkey", "l_linenumber", 8)
    assert(salted.count() === plain.count())
    assert(salted.select(li.columns.head, li.columns.tail: _*)
      .exceptAll(plain.select(li.columns.head, li.columns.tail: _*))
      .count() === 0)
  }
}
