package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core OLAP surface — bench headliners on the TPC-H-ish star schema.
  *
  * These are the general analytical shapes any lakehouse serves (the
  * reference serves them through Trino/dbt over the same layout).
  * Scale design:
  *  - money sums are per-row double products cast to DECIMAL (exact,
  *    order-independent partial aggregation on the map side);
  *  - averages are exact-sum / count at the end — never a double SUM
  *    whose value depends on partitioning;
  *  - every dimension join is broadcast; the only shuffles are the
  *    final group-bys on the (small) grouping keys;
  *  - top-k uses rank-within-partition or a bounded sort, never a
  *    global materialized sort of the fact table.
  */
object Analytics {

  private def decSum(c: Column, as: String) =
    sum(c).cast("decimal(18,4)").as(as)

  /** TPC-H Q1 shape: wide single-pass aggregation with map-side
    * partials over lineitem. */
  def q1PricingSummary(lineitem: DataFrame): DataFrame = {
    val discPrice =
      (col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
        .cast("decimal(18,6)")
    val charge =
      ((col("l_extendedprice") * (lit(1.0d) - col("l_discount"))) *
        (lit(1.0d) + col("l_tax"))).cast("decimal(18,6)")
    lineitem
      .filter(col("l_shipdate") <= lit("2001-08-01").cast("timestamp_ntz"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        decSum(col("l_quantity").cast("decimal(18,4)"), "sum_qty"),
        decSum(col("l_extendedprice").cast("decimal(18,4)"), "sum_base_price"),
        sum(discPrice).cast("decimal(18,6)").as("sum_disc_price"),
        sum(charge).cast("decimal(18,6)").as("sum_charge"),
        graft.functions.Rounding.roundScaled(
          sum(col("l_quantity").cast("decimal(18,4)")).cast("double") /
            count(lit(1)), 6).cast("decimal(18,6)").as("avg_qty"),
        graft.functions.Rounding.roundScaled(
          sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double") /
            count(lit(1)), 6).cast("decimal(18,6)").as("avg_price"),
        graft.functions.Rounding.roundScaled(
          sum(col("l_discount").cast("decimal(18,6)")).cast("double") /
            count(lit(1)), 6).cast("decimal(18,6)").as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3 shape: broadcast dim filter + fact-fact join + group +
    * deterministic top-k. */
  def q3ShippingPriority(customer: DataFrame, orders: DataFrame,
                         lineitem: DataFrame): DataFrame = {
    val cutoff = lit("1996-06-30").cast("timestamp_ntz")
    val cust = customer.filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = orders.filter(col("o_orderdate") < cutoff)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = lineitem.filter(col("l_shipdate") > cutoff)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
        .cast("decimal(18,6)")).cast("decimal(18,6)").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: 5-way star join, all dimensions broadcast, single
    * shuffle on the final n_name group. */
  def q5RegionRevenue(region: DataFrame, nation: DataFrame,
                      customer: DataFrame, supplier: DataFrame,
                      orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val nations = nation
      .join(broadcast(region.filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = customer.join(broadcast(nations),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    val supp = supplier.select("s_suppkey", "s_nationkey")
    val ord = orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "c_nationkey", "n_name")
    lineitem
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey") &&
                 col("s_nationkey") === col("c_nationkey"))
      .groupBy("n_name")
      .agg(sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
        .cast("decimal(18,6)")).cast("decimal(18,6)").as("revenue"))
  }

  /** TPC-H Q18 shape (large-volume orders): aggregate the fact table
    * ONCE — one l_orderkey shuffle with map-side partials — then filter
    * the rare heavy orders and join the survivors to orders/customer.
    * No semi-join re-scan of lineitem (the textbook Q18 plan reads the
    * fact twice); the heavy set is proportional-but-rare, so the join
    * to orders shuffles on the order key and AQE promotes it to
    * broadcast when the filtered side is actually small. The top-100 is
    * `TakeOrderedAndProject` (bounded heap), never a global sort. */
  def q18LargeOrders(customer: DataFrame, orders: DataFrame,
                     lineitem: DataFrame, minQty: Double = 250.0d): DataFrame = {
    val heavy = lineitem.groupBy("l_orderkey")
      .agg(sum(col("l_quantity").cast("decimal(18,4)"))
        .cast("decimal(18,4)").as("total_qty"))
      .filter(col("total_qty") > minQty)
    orders.join(heavy, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(customer.select("c_custkey", "c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q4 shape (EXISTS decorrelated to a left-semi join): orders
    * with at least one returned line, counted per priority class. The
    * semi-join never duplicates an orders row (no post-join distinct
    * needed), the filtered lineitem side projects to the single join
    * key before the exchange, and AQE promotes it to broadcast when
    * the returned-lines set is small. One fact scan per side. */
  def q4OrderPriority(orders: DataFrame, lineitem: DataFrame,
                      returnflag: String = "R"): DataFrame =
    orders.join(
        lineitem.filter(col("l_returnflag") === returnflag)
          .select(col("l_orderkey").as("o_orderkey")),
        Seq("o_orderkey"), "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))

  /** TPC-H Q19 shape (disjunctive predicate join): revenue over an OR
    * of brand/size/quantity conjunctions. The part-side disjuncts
    * filter the dimension BEFORE the broadcast (a row survives only if
    * SOME disjunct's part-half holds), the quantity bound common to all
    * disjuncts pushes to the fact scan, and the residual mixed-side
    * condition rides the join. One fact scan, zero pre-aggregate
    * shuffles, 1-row result. */
  def q19DisjunctiveRevenue(part: DataFrame,
                            lineitem: DataFrame): DataFrame = {
    val p1 = col("p_brand") === "Brand#12" && col("p_size").between(1, 5)
    val p2 = col("p_brand") === "Brand#23" && col("p_size").between(1, 10)
    val p3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 15)
    val q1 = col("l_quantity") >= 1.0d && col("l_quantity") <= 11.0d
    val q2 = col("l_quantity") >= 10.0d && col("l_quantity") <= 20.0d
    val q3 = col("l_quantity") >= 20.0d && col("l_quantity") <= 30.0d
    val partFlt = part.filter(p1 || p2 || p3)
      .select("p_partkey", "p_brand", "p_size")
    lineitem
      .filter(col("l_quantity") <= 30.0d) // common bound -> parquet scan
      .join(broadcast(partFlt), col("l_partkey") === col("p_partkey"))
      .filter((p1 && q1) || (p2 && q2) || (p3 && q3))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .cast("decimal(18,6)")).cast("decimal(18,6)").as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** TPC-H Q17 shape (small-quantity orders vs per-part average): the
    * textbook plan decorrelates the scalar subquery into a lineitem
    * self-join — TWO fact scans. Spark-first, the per-part average is
    * a window over the SAME partitioning the filtered fact already
    * has: one scan, one shuffle on l_partkey (after the broadcast part
    * filter cuts the fact early), exact decimal sums under the ratio. */
  def q17SmallOrders(part: DataFrame, lineitem: DataFrame,
                     brand: String = "Brand#4"): DataFrame = {
    val flt = part.filter(col("p_brand") === brand)
      .select(col("p_partkey").as("l_partkey"))
    val w = Window.partitionBy("l_partkey")
    lineitem.join(broadcast(flt), "l_partkey")
      .withColumn("avg_qty",
        sum(col("l_quantity").cast("decimal(18,4)")).over(w).cast("double") /
          count(lit(1)).over(w).cast("double"))
      .filter(col("l_quantity") < lit(0.2d) * col("avg_qty"))
      .agg(
        (sum(col("l_extendedprice").cast("decimal(18,4)")).cast("double") /
          lit(7.0d)).as("avg_yearly"),
        count(lit(1)).as("n_small_orders"))
  }

  /** TPC-H Q6 shape (forecast revenue change): pure scan + filter +
    * 1-row aggregate — the pushdown benchmark. Every predicate reaches
    * the parquet scan (`PushedFilters`); no join, no shuffle beyond
    * the final 1-row combine; exact decimal revenue sum. */
  def q6ForecastRevenue(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz") &&
        col("l_discount") >= 0.05d && col("l_discount") <= 0.07d &&
        col("l_quantity") < 24.0d)
      .agg(
        sum((col("l_extendedprice") * col("l_discount"))
          .cast("decimal(18,6)")).cast("decimal(18,6)").as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q10 shape (returned-item revenue): quarter of orders joined
    * to R-flagged lineitems, revenue per customer, customer + nation
    * dims broadcast onto the already-reduced rollup, bounded top-20
    * (`TakeOrderedAndProject`). The fact-fact join shuffles on
    * l_orderkey once; customer attributes join AFTER the reduction to
    * ‖customers‖ rows, never onto fact rows. */
  def q10ReturnedItems(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, nation: DataFrame): DataFrame = {
    val ord = orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
      .select("o_orderkey", "o_custkey")
    val li = lineitem.filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val perCust = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_custkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
        .cast("decimal(18,6)")).cast("decimal(18,6)").as("revenue"))
    perCust
      .join(broadcast(customer.select("c_custkey", "c_name", "c_acctbal",
        "c_nationkey")), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("revenue"),
        col("c_acctbal"), col("n_name"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q14 shape (promo revenue share): one month of lineitems,
    * part dim broadcast, the promo/total ratio folded into ONE
    * conditional aggregate over a single scan — exact decimal sums
    * under the final double ratio. */
  def q14PromoRevenue(part: DataFrame, lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") >= lit("1996-09-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-10-01").cast("timestamp_ntz"))
      .join(broadcast(part.select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("rev",
        (col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .cast("decimal(18,6)"))
      .agg(
        graft.functions.Rounding.roundScaled(
          lit(100.0d) *
            sum(when(col("p_type") === "PROMO", col("rev"))
              .otherwise(lit(0).cast("decimal(18,6)"))).cast("double") /
            sum(col("rev")).cast("double"), 6).as("promo_revenue_pct"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q15 shape (top supplier): per-supplier quarter revenue,
    * then the argmax WITHOUT a second fact scan — the 1-row global max
    * is broadcast back onto the ‖suppliers‖-sized rollup (the textbook
    * view-self-join re-aggregates the fact table). Decimal equality is
    * exact, so ties surface deterministically as multiple rows ordered
    * by the unique supplier key. */
  def q15TopSupplier(supplier: DataFrame, lineitem: DataFrame): DataFrame = {
    val rev = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp_ntz"))
      .groupBy("l_suppkey")
      .agg(sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
        .cast("decimal(18,6)")).cast("decimal(18,6)").as("total_revenue"))
    rev
      .crossJoin(broadcast(rev.agg(max("total_revenue").as("_mx"))))
      .filter(col("total_revenue") === col("_mx"))
      .join(broadcast(supplier.select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  /** Per-customer top-3 orders by value: dense window top-k (rank state
    * only, no global sort). */
  def topOrdersPerCustomer(orders: DataFrame, k: Int = 3): DataFrame =
    orders
      .withColumn("rn", row_number().over(
        Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))))
      .filter(col("rn") <= k)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the textbook
    * query correlates one EXISTS (another supplier participated in the
    * order) and one NOT EXISTS (no OTHER supplier was late) against the
    * same fact — three lineitem scans if decorrelated naively into a
    * semi- and an anti-join. Spark-first both predicates are per-order
    * supplier-set cardinalities, so they ride ONE window over the
    * orderkey partitioning the orders join just produced: a line
    * qualifies iff it is late, the order has ≥2 distinct suppliers, and
    * the order's LATE-supplier set is exactly one (necessarily this
    * line's). One fact scan, one orderkey shuffle, no self-joins.
    * "Late" adapts TPC-H's receiptdate>commitdate to this schema:
    * shipped more than `lateDays` after the order date.
    * Output ordered numwait DESC with the unique name as tiebreak. */
  def q21WaitingSupplier(supplier: DataFrame, nation: DataFrame,
                         orders: DataFrame, lineitem: DataFrame,
                         nationName: String = "NATION_3",
                         lateDays: Int = 30): DataFrame = {
    val w = Window.partitionBy("l_orderkey")
    val late = col("l_shipdate") >
      col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS")
    val suppliers = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey", "s_name")
    lineitem
      .select("l_orderkey", "l_suppkey", "l_shipdate")
      .join(orders.filter(col("o_orderstatus") === "F")
          .select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("is_late", late)
      // both set-cardinalities share one Window node (same spec, same
      // projection) — a single sorted pass over the orderkey shuffle
      .select(col("l_suppkey"), col("is_late"),
        size(collect_set(col("l_suppkey")).over(w)).as("n_supp"),
        size(collect_set(
          when(col("is_late"), col("l_suppkey"))).over(w)).as("n_late_supp"))
      .filter(col("is_late") && col("n_supp") >= 2 &&
        col("n_late_supp") === 1)
      .join(broadcast(suppliers), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  /** TPC-H Q22 shape (global sales opportunity): customers whose
    * balance beats the global positive-balance average (a scalar
    * subquery → a 1-row broadcast, never a recomputed fact scan per
    * row) and who placed no urgent order (correlated NOT EXISTS → a
    * left-anti join against the pre-projected order keys). The anti
    * side projects to the single join key before the exchange and AQE
    * broadcasts whichever side is small. Grouped per nation (this
    * schema's analog of the phone country code). Exact decimal balance
    * sums; ordered by the unique nation name. */
  def q22GlobalSalesOpp(customer: DataFrame, nation: DataFrame,
                        orders: DataFrame,
                        priority: String = "1-URGENT"): DataFrame = {
    val avgBal = customer.filter(col("c_acctbal") > 0.0d)
      .agg((sum(col("c_acctbal").cast("decimal(18,4)")).cast("double") /
        count(lit(1)).cast("double")).as("_avg_bal"))
    customer
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("_avg_bal"))
      .join(orders.filter(col("o_orderpriority") === priority)
          .select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"), "left_anti")
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        decSum(col("c_acctbal").cast("decimal(18,4)"), "totacctbal"))
      .orderBy("cntrycode")
  }

  /** TPC-H Q16 shape (supplier-part count): distinct suppliers per
    * part class, excluding a NOT-IN supplier set (distressed balance —
    * this schema's analog of the complaints LIKE). NOT IN over a
    * nullable column is three-valued; `s_suppkey` is a non-null key,
    * so it decorrelates to a left-anti join (asserted non-null by the
    * filter so the equivalence is structural, not incidental). The
    * exclusion set is tiny → broadcast anti; `part` filters before its
    * broadcast; the association is lineitem (this schema has no
    * partsupp), deduplicated by the distinct count itself — one fact
    * scan, one shuffle on the grouping keys. */
  def q16SupplierParts(part: DataFrame, supplier: DataFrame,
                       lineitem: DataFrame,
                       excludeBrand: String = "Brand#4",
                       excludeTypePrefix: String = "MEDIUM",
                       sizes: Seq[Int] = Seq(1, 9, 14, 19, 23, 36, 45, 49))
      : DataFrame = {
    val parts = part
      .filter(col("p_brand") =!= excludeBrand &&
        !col("p_type").startsWith(excludeTypePrefix) &&
        col("p_size").isin(sizes: _*))
      .select("p_partkey", "p_brand", "p_type", "p_size")
    val distressed = supplier.filter(col("s_acctbal") < 0.0d)
      .filter(col("s_suppkey").isNotNull) // NOT IN ≡ anti join iff no nulls
      .select(col("s_suppkey").as("l_suppkey"))
    lineitem
      .select("l_partkey", "l_suppkey")
      .join(broadcast(distressed), Seq("l_suppkey"), "left_anti")
      .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  /** ROLLUP cube over the trade mart: per (product, date), per
    * product, and grand-total rows in ONE pass. Spark plans ROLLUP as
    * a single Expand (each input row replicated once per grouping set)
    * feeding one hash aggregate with map-side partials — never N
    * re-scans unioned together. `grouping_id` disambiguates the
    * super-aggregate rows (bit per column, MSB = first column, same
    * convention as DuckDB/Trino GROUPING_ID). Exact decimal value
    * sums; the 3×‖products×dates‖ Expand fan-out is what every engine
    * pays for a rollup and stays proportional to the already-reduced
    * grouping, not the fact. */
  def salesCube(stg: DataFrame): DataFrame =
    stg
      .rollup(col("product_id"), col("_trade_date"))
      .agg(
        sum(col("trade_value")).cast("decimal(18,8)").as("total_value"),
        decSum(col("size"), "total_size"),
        count(lit(1)).as("n_trades"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("product_id"), col("_trade_date"))

  /** CUBE over (product, side): all four grouping sets — per pair,
    * per product, per side, grand total — in the same single-Expand
    * plan as [[salesCube]] (each input row replicated once per set,
    * one hash aggregate with map-side partials). The buy/sell margin
    * view every OLAP tool builds; `grouping_id` disambiguates. */
  def tradeCube(stg: DataFrame): DataFrame =
    stg
      .cube(col("product_id"), col("side"))
      .agg(
        sum(col("trade_value")).cast("decimal(18,8)").as("total_value"),
        count(lit(1)).as("n_trades"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("product_id"), col("side"))

  /** Explicit GROUPING SETS over (product, side) — the third member of
    * the grouping-family API after [[salesCube]] (ROLLUP) and
    * [[tradeCube]] (CUBE): only the sets the analyst asks for
    * ((product, side), (product), (side)) — no grand-total row — in
    * ONE single-Expand plan (each input row replicated once per
    * requested set, one hash aggregate with map-side partials), never
    * N scans unioned. `grouping_id` keeps the same bit convention as
    * the other two. */
  def tradeGroupingSets(stg: DataFrame): DataFrame =
    stg
      .groupingSets(
        Seq(Seq(col("product_id"), col("side")),
          Seq(col("product_id")), Seq(col("side"))),
        col("product_id"), col("side"))
      .agg(
        sum(col("trade_value")).cast("decimal(18,8)").as("total_value"),
        count(lit(1)).as("n_trades"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("product_id"), col("side"))

  /** TPC-H Q13 shape (customer order-count distribution): a filtered
    * LEFT OUTER join grouped twice. The filter lives in the JOIN
    * condition (orders side only), so it pre-aggregates: count orders
    * per customer FIRST (map-side partials on the fact), then left-join
    * the ‖customers‖-sized rollup and histogram — the outer join never
    * carries fact-table width, and customers with no surviving orders
    * coalesce to zero. Two shuffles total (custkey, then the tiny
    * c_count histogram). */
  def q13CustomerDistribution(customer: DataFrame, orders: DataFrame,
                              excludePriority: String = "1-URGENT")
      : DataFrame = {
    val perCust = orders
      .filter(col("o_orderpriority") =!= excludePriority)
      .groupBy(col("o_custkey").as("c_custkey"))
      .agg(count(lit(1)).as("_n"))
    customer.select("c_custkey")
      .join(perCust, Seq("c_custkey"), "left_outer")
      .select(coalesce(col("_n"), lit(0L)).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q7 shape (volume shipping): bilateral trade between a
    * nation watchlist, per (supplier nation, customer nation, year).
    * Both nation legs pre-filter their dimension BEFORE the broadcast
    * (supplier and customer shrink to the watchlist's members), so
    * the only fact-sized exchange is the lineitem↔orders join on
    * l_orderkey — and the orders side arrives pre-reduced to watchlist
    * customers' orders. The cross-nation inequality applies after both
    * cheap broadcasts, never as a join re-scan per nation pair. The
    * two-year ship-date band pushes to the parquet scan. */
  def q7VolumeShipping(supplier: DataFrame, nation: DataFrame,
                       customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame,
                       nations: Seq[String] =
                         Seq("NATION_3", "NATION_8", "NATION_12"))
      : DataFrame = {
    val n = nation.filter(col("n_name").isin(nations: _*))
      .select("n_nationkey", "n_name")
    val supp = supplier
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val cust = customer
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val ord = orders
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "cust_nation")
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(
        sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .cast("decimal(18,6)")).cast("decimal(18,6)").as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q8 shape (national market share): one nation's share of a
    * region's spend on one part type, per order year. All four
    * dimension legs (region-filtered customers, nation-named
    * suppliers, type-filtered parts) broadcast; the share folds into
    * ONE conditional aggregate over a single fact pass — the textbook
    * nested-subquery form would re-scan the join per year. Exact
    * decimal sums under the final double ratio (same discipline as
    * [[q14PromoRevenue]]). */
  def q8MarketShare(region: DataFrame, nation: DataFrame,
                    customer: DataFrame, supplier: DataFrame,
                    orders: DataFrame, lineitem: DataFrame,
                    part: DataFrame,
                    shareNation: String = "NATION_2",
                    regionName: String = "ASIA",
                    partType: String = "PROMO"): DataFrame = {
    val rnations = nation
      .join(broadcast(region.filter(col("r_name") === regionName)),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    val cust = customer
      .join(broadcast(rnations), col("c_nationkey") === col("n_nationkey"))
      .select("c_custkey")
    val ord = orders
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select("o_orderkey", "o_orderdate")
    val supp = supplier
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val pf = part.filter(col("p_type") === partType).select("p_partkey")
    lineitem
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .withColumn("rev",
        (col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
          .cast("decimal(18,6)"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(
        graft.functions.Rounding.roundScaled(
          sum(when(col("supp_nation") === shareNation, col("rev"))
            .otherwise(lit(0).cast("decimal(18,6)"))).cast("double") /
            sum(col("rev")).cast("double"), 6).as("mkt_share"),
        count(lit(1)).as("n_lines"))
      .orderBy("o_year")
  }

  /** TPC-H Q2 shape (minimum-cost supplier): for each part in a size
    * class, the supplier(s) quoting the minimum price. The textbook
    * correlated scalar-MIN subquery decorrelates to a self-join — two
    * fact scans; Spark-first the per-part minimum is a window over the
    * l_partkey partitioning the broadcast part-filter join already
    * established (same trick as [[q17SmallOrders]]): ONE fact scan,
    * one shuffle. Ties at the minimum survive as distinct (part,
    * supplier) rows; min over the same stored doubles is exact on
    * every engine, so the equality never drifts. Top-100 bounded by a
    * total order on (balance DESC, unique supplier name, unique part
    * key). */
  def q2MinCostSupplier(part: DataFrame, supplier: DataFrame,
                        nation: DataFrame, lineitem: DataFrame,
                        size: Int = 15): DataFrame = {
    val pf = part.filter(col("p_size") === size)
      .select("p_partkey", "p_name")
    val w = Window.partitionBy("l_partkey")
    val minLines = lineitem
      .join(broadcast(pf.select(col("p_partkey").as("l_partkey"))),
        Seq("l_partkey"))
      .withColumn("min_price", min(col("l_extendedprice")).over(w))
      .filter(col("l_extendedprice") === col("min_price"))
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice").as("price"))
      .distinct() // tying lines collapse to one (part, supplier) row
    minLines
      .join(broadcast(supplier.select("s_suppkey", "s_name", "s_acctbal",
        "s_nationkey")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"), col("price"))
      .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q11 shape (important stock): per-part inventory value for
    * one nation's suppliers, kept only where it exceeds a threshold
    * share of the nation's total — a scalar aggregate subquery in
    * HAVING. TPC-H divides its fixed fraction by SF so the cut tracks
    * part count; here the threshold is data-derived for the same
    * sf-invariance: `avgMultiplier / ‖parts‖` of the total, i.e. parts
    * worth more than `avgMultiplier ×` the average part value (the
    * ×2.0 is an exact IEEE exponent bump, so the comparison stays
    * bit-identical cross-engine). The textbook form recomputes the
    * total from a SECOND fact scan; Spark-first the global total and
    * part count re-aggregate the ‖parts‖-sized rollup itself (exact
    * decimal sums are associative, so the two are identical) and
    * broadcast the 1-row result back. One fact scan, one l_partkey
    * shuffle, one tiny re-aggregation. */
  def q11ImportantParts(supplier: DataFrame, nation: DataFrame,
                        lineitem: DataFrame,
                        nationName: String = "NATION_3",
                        avgMultiplier: Double = 2.0d): DataFrame = {
    val supp = supplier
      .join(broadcast(nation.filter(col("n_name") === nationName)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey").as("l_suppkey"))
    // persisted: the rollup feeds both the HAVING filter and the 1-row
    // total — without it the fact would be scanned twice at execution
    val perPart = lineitem
      .join(broadcast(supp), Seq("l_suppkey"))
      .groupBy("l_partkey")
      .agg(sum((col("l_extendedprice") * col("l_quantity"))
        .cast("decimal(18,4)")).cast("decimal(18,4)").as("part_value"))
      .persist()
    val stats = perPart
      .agg(sum("part_value").cast("decimal(18,4)").as("_total"),
        count(lit(1)).as("_nparts"))
    perPart
      .crossJoin(broadcast(stats))
      .filter(col("part_value").cast("double") >
        lit(avgMultiplier) *
          (col("_total").cast("double") / col("_nparts").cast("double")))
      .select(col("l_partkey"), col("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** Day-of-week × product cross-tab via `pivot` — the BI matrix
    * report. Pivot values are FIXED up front (`d1`..`d7`), so Catalyst
    * compiles straight to one conditional-aggregate pass (no
    * values-discovery pre-query, deterministic column order) — exactly
    * the plan the hand-written CASE WHEN oracle runs; absent cells
    * stay NULL on both engines. One product_id shuffle. */
  def tradeDowPivot(stg: DataFrame): DataFrame =
    stg
      .withColumn("dow", concat(lit("d"), dayofweek(col("trade_time"))))
      .groupBy("product_id")
      .pivot("dow", (1 to 7).map("d" + _))
      .agg(sum(col("trade_value")).cast("decimal(18,8)"))
      .orderBy("product_id")

  /** Customer value deciles — the ranking-bucket window family
    * (segmentation reports), computed as an EXACT two-pass ntile with
    * NO single-partition sort anywhere: a bare
    * `ntile().over(Window.orderBy(...))` funnels the whole ‖customers‖
    * rollup through ONE task, the serial stage that caps this operator
    * at scale. Instead:
    *
    *  1. range-partition the rollup on the ntile ORDER (value DESC,
    *     custkey) — a distributed sort, every partition a contiguous
    *     rank range;
    *  2. per-partition row counts (tiny: ≤‖shuffle partitions‖ rows)
    *     prefix-sum into partition rank OFFSETS;
    *  3. global 0-indexed rank = offset + per-partition row_number − 1
    *     (the row_number window partitions by `spark_partition_id()`,
    *     so its sort is per-partition, never global);
    *  4. the bucket is SQL ntile's closed form over (rank i, n rows,
    *     b buckets): base = n div b, rem = n mod b, first `rem`
    *     buckets hold base+1 rows —
    *     i < (base+1)·rem ? i div (base+1) + 1
    *                      : rem + (i − (base+1)·rem) div base + 1
    *     — bit-identical to the window ntile under the same total
    *     order (value DESC, unique custkey), which the oracle and
    *     AnalyticsSpec pin.
    *
    * The range-partitioned rollup is cached (single fill inside the one
    * action) so the offsets side and the ranked side observe the SAME
    * physical partitioning; the offsets side is broadcast. Costs one
    * extra exchange vs the single-window plan at toy scale — the price
    * of removing the serial stage. */
  def customerValueDeciles(orders: DataFrame,
                           buckets: Int = 10): DataFrame = {
    // perCust persisted: the range exchange's SAMPLING pass and the
    // shuffle itself would otherwise each evaluate the orders aggregate
    val perCust = orders.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice").cast("decimal(18,4)"))
        .cast("decimal(18,4)").as("cust_value"))
      .persist()
    // cached ONCE (single fill within the one action): the offsets side
    // and the ranked side must observe the SAME physical range
    // partitioning — two independent evaluations of the exchange could
    // sample different range bounds and skew every offset
    val sorted = perCust
      .repartitionByRange(col("cust_value").desc, col("o_custkey"))
      .withColumn("_pid", spark_partition_id())
      .persist()
    val counts = sorted.groupBy("_pid").agg(count(lit(1)).as("_cnt"))
    // offsets + total over ≤‖partitions‖ rows — a trivially small frame,
    // so its single-partition running-sum window is metadata-sized
    val offs = counts
      .withColumn("_off", coalesce(sum("_cnt").over(
        Window.orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum("_cnt").over(
        Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
      .withColumn("_base", expr(s"_n div ${buckets}L"))
      .withColumn("_rem", expr(s"_n % ${buckets}L"))
      .select("_pid", "_off", "_base", "_rem")
    sorted
      .join(broadcast(offs), "_pid")
      .withColumn("_lrn", row_number().over(
        Window.partitionBy("_pid")
          .orderBy(col("cust_value").desc, col("o_custkey"))))
      .withColumn("_i", col("_off") + col("_lrn") - 1L)
      .withColumn("decile",
        // integer `div` throughout — `/` would be IEEE double division
        when(col("_i") < (col("_base") + 1L) * col("_rem"),
          expr("_i div (_base + 1L)") + 1L)
          .otherwise(col("_rem") +
            expr("(_i - (_base + 1L) * _rem) div greatest(_base, 1L)") +
            1L)
          .cast("int"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_customers"),
        sum("cust_value").cast("decimal(18,4)").as("decile_value"))
      .orderBy("decile")
  }

  /** TPC-H Q9 shape (product-type profit): per (supplier nation, order
    * year) profit over a part-name-filtered slice. Part (with its
    * retail price standing in for ps_supplycost — this schema has no
    * partsupp) and supplier→nation broadcast onto the fact; the only
    * fact-sized exchange is lineitem↔orders on l_orderkey for the
    * order year. Per-row profit is pure double arithmetic cast to
    * decimal — exact, order-proof partial aggregation. */
  def q9ProductProfit(part: DataFrame, supplier: DataFrame,
                      nation: DataFrame, orders: DataFrame,
                      lineitem: DataFrame,
                      nameContains: String = "red"): DataFrame = {
    val pf = part.filter(col("p_name").contains(nameContains))
      .select("p_partkey", "p_retailprice")
    val supp = supplier
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("nation"))
    lineitem
      .join(broadcast(pf), col("l_partkey") === col("p_partkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .join(orders.select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .withColumn("profit",
        (col("l_extendedprice") * (lit(1.0d) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity")).cast("decimal(18,6)"))
      .groupBy(col("nation"), year(col("o_orderdate")).as("o_year"))
      .agg(sum(col("profit")).cast("decimal(18,6)").as("profit"),
        count(lit(1)).as("n_lines"))
      .orderBy("nation", "o_year")
  }

  /** TPC-H Q12 shape (shipping-priority split): one year of lineitems
    * joined to orders, urgent/non-urgent line counts folded into two
    * conditional aggregates grouped by line status. The orders side
    * projects to (key, priority) before the exchange; the ship-date
    * band pushes to the fact scan; one orderkey shuffle, integer
    * conditional sums (no FP anywhere). */
  def q12PriorityShipping(orders: DataFrame, lineitem: DataFrame,
                          highPriorities: Seq[String] =
                            Seq("1-URGENT", "2-HIGH")): DataFrame = {
    val isHigh = col("o_orderpriority").isin(highPriorities: _*)
    lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .select("l_orderkey", "l_linestatus")
      .join(orders.select("o_orderkey", "o_orderpriority"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(isHigh, lit(1L)).otherwise(lit(0L))).as("high_line_count"),
        sum(when(!isHigh, lit(1L)).otherwise(lit(0L))).as("low_line_count"))
      .orderBy("l_linestatus")
  }

  /** TPC-H Q20 shape (potential promotion suppliers): nested IN
    * subqueries — suppliers who shipped more than a threshold quantity
    * of a name-filtered part class — decorrelated into an aggregate
    * HAVING rollup followed by a LEFT SEMI join. The part filter
    * broadcasts onto the fact, the qualifying-supplier set reduces to
    * ‖suppliers‖ rows before the semi join (which AQE broadcast-
    * promotes), and supplier attributes join after. One fact scan, one
    * l_suppkey shuffle. */
  def q20PotentialPromo(part: DataFrame, supplier: DataFrame,
                        nation: DataFrame, lineitem: DataFrame,
                        namePrefix: String = "red",
                        minQty: Double = 200.0d): DataFrame = {
    val pf = part.filter(col("p_name").startsWith(namePrefix))
      .select(col("p_partkey").as("l_partkey"))
    val qualified = lineitem
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz"))
      .join(broadcast(pf), Seq("l_partkey"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_quantity").cast("decimal(18,4)"))
        .cast("decimal(18,4)").as("total_qty"))
      .filter(col("total_qty").cast("double") > minQty)
      .select(col("l_suppkey").as("s_suppkey"))
    supplier
      .join(qualified, Seq("s_suppkey"), "left_semi")
      .join(broadcast(nation.select("n_nationkey", "n_name")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))
      .orderBy("s_name")
  }
}
