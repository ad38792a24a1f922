package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables
import graft.streaming.BronzeStream

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  *
  * Cache-ownership contract: query builders may `persist()` /
  * `localCheckpoint()` shared subtrees (a frame feeding 2+ consumers of
  * the RETURNED lazy plan cannot be unpersisted inside the builder
  * without forfeiting the reuse). CALLERS own cleanup: run
  * `spark.sharedState.cacheManager.clearCache()` and unpersist
  * `spark.sparkContext.getPersistentRDDs` between queries, exactly as
  * Bench/Verify do — a long-lived session that skips this accumulates
  * caches across keys. */
object SparkEntry {

  // ---- shared trade-model builders (SURVEY §1) --------------------------

  /** `pipeline_health`'s shared `_metrics` history per sf dir — the
    * key's two pipeline executions run once per process (setup); the
    * key itself measures the dashboard rollup. */
  private val healthHistoryDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]

  private def bronze(s: SparkSession, dir: String): DataFrame =
    Bronze.ingest(Tables.events(s, dir))

  private def bronzeDup(s: SparkSession, dir: String): DataFrame =
    Bronze.withRedeliveries(bronze(s, dir))

  private def silver(s: SparkSession, dir: String): DataFrame =
    BronzeToSilver.transform(bronzeDup(s, dir))

  private def stg(s: SparkSession, dir: String): DataFrame =
    Staging.stgTrades(silver(s, dir))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Ohlcv.ohlcv1m(stg(spark, "/root/testdata/sf0.001"))

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Every query is passed through [[graft.functions.Rounding.asDoubles]]:
    * operators return exact DECIMAL money columns, but the driver's hash
    * canonicalizes decimals differently on the Spark-parquet side vs the
    * DuckDB side, so the contract boundary emits float64 (the oracle SQL
    * casts the same columns to DOUBLE).
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    rawQueries.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) =>
        graft.functions.Rounding.asDoubles(fn(s, dir)))
    }

  private def rawQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // -- lakehouse pipeline (SURVEY §2 rows 1-13) --
    "bronze_ingest" -> ((s, dir) => bronze(s, dir)),
    "streaming_bronze" -> ((s, dir) => BronzeStream.windowedVolume(s, dir)),
    "silver_dedup" -> ((s, dir) => BronzeToSilver.dedup(bronzeDup(s, dir))),
    "silver_transform" -> ((s, dir) => silver(s, dir)),
    "incremental_read" -> ((s, dir) =>
      BronzeToSilver.incrementalRead(bronzeDup(s, dir))),
    "merge_upsert" -> { (s, dir) =>
      // sv feeds the target filter once and the source filter twice
      // (anti-join probe + union branch) — persist so the
      // bronze->silver dedup window runs once, not three times
      val sv = silver(s, dir).persist()
      val target = sv.filter(col("trade_id") % 3 =!= 0)
      val source = sv.filter(col("trade_id") % 2 === 0)
        .withColumn("price",
          (col("price").cast("double") * lit(1.005d)).cast("decimal(18,8)"))
      MergeUpsert.merge(target, source, "trade_id")
    },
    "silver_stats" -> ((s, dir) => BronzeToSilver.stats(silver(s, dir))),
    "stg_trades" -> ((s, dir) => stg(s, dir)),
    "ohlcv_1m" -> ((s, dir) => Ohlcv.ohlcv1m(stg(s, dir))),
    "ohlcv_1h" -> ((s, dir) => Ohlcv.ohlcv1h(Ohlcv.ohlcv1m(stg(s, dir)))),
    "daily_metrics" -> ((s, dir) =>
      DailyMetrics.daily(Ohlcv.ohlcv1h(Ohlcv.ohlcv1m(stg(s, dir))))),
    "asof_join" -> { (s, dir) =>
      // stg feeds both the left (trades) side and the candle rollup —
      // persist so the events->silver chain runs once
      val st = stg(s, dir).persist()
      AsofJoin.tradeVsPrevHour(st, Ohlcv.ohlcv1h(Ohlcv.ohlcv1m(st)))
    },
    "asof_join_bucketed" -> { (s, dir) =>
      val st = stg(s, dir).persist()
      AsofJoin.tradeVsPrevHourBucketed(st, Ohlcv.ohlcv1h(Ohlcv.ohlcv1m(st)))
    },
    "rolling_metrics" -> ((s, dir) =>
      Ohlcv.rolling(Ohlcv.ohlcv1m(stg(s, dir)))),
    "ewma_price" -> ((s, dir) =>
      Ohlcv.ewma(Ohlcv.ohlcv1m(stg(s, dir)))),
    "rsi_14" -> ((s, dir) =>
      Ohlcv.rsi(Ohlcv.ohlcv1m(stg(s, dir)))),
    "ohlcv_gap_fill" -> { (s, dir) =>
      // m1 feeds the bounds aggregate AND the spine join — persist it
      val m1 = Ohlcv.ohlcv1m(stg(s, dir)).persist()
      Ohlcv.gapFill(m1)
    },
    "anomaly_zscore" -> ((s, dir) =>
      Ohlcv.anomalyZscore(Ohlcv.ohlcv1m(stg(s, dir)))),
    "twap_1h" -> ((s, dir) => Microstructure.twap1h(stg(s, dir))),
    "pair_correlation" -> { (s, dir) =>
      // h1 feeds the no-watchlist valve count AND both self-join legs —
      // persist so the events->silver->candle chain runs once, not 3×.
      // Persist the PRUNED projection (the 3 columns the correlation
      // touches), not full h1: caching every candle column would
      // materialize the vwap/volume arithmetic the unpersisted legs'
      // column pruning never computed (measured slower than the 3×
      // recompute it replaced).
      val h1 = Ohlcv.ohlcv1h(Ohlcv.ohlcv1m(stg(s, dir)))
        .select("product_id", "window_start", "close").persist()
      Microstructure.pairCorrelation(h1)
    },
    "flow_imbalance" -> ((s, dir) =>
      Microstructure.flowImbalance(stg(s, dir))),
    "range_join" -> { (s, dir) =>
      // stg feeds both the candle chain and the point side — persist
      val st = stg(s, dir).persist()
      Microstructure.tradesDuringAnomalies(st, Ohlcv.ohlcv1m(st))
    },
    "price_latest" -> { (s, dir) =>
      // stg/m1/h1 each feed two consumers (candle rollup + horizon
      // lookup) — persist so the events->silver chain runs once
      val st = stg(s, dir).persist()
      val m1 = Ohlcv.ohlcv1m(st).persist()
      val h1 = Ohlcv.ohlcv1h(m1).persist()
      PriceLatest.latest(st, m1, h1, DailyMetrics.daily(h1))
    },
    // the market dashboard's one backing table: price_latest columns +
    // the trailing-24h candle rollup (h1 feeds the rollup AND the
    // serving-table chain — persist the shared chain once)
    "market_dashboard" -> { (s, dir) =>
      val st = stg(s, dir).persist()
      val m1 = Ohlcv.ohlcv1m(st).persist()
      val h1 = Ohlcv.ohlcv1h(m1).persist()
      MarketDashboard.dashboard(
        PriceLatest.latest(st, m1, h1, DailyMetrics.daily(h1)), h1)
    },
    "data_quality" -> { (s, dir) =>
      // full-pipeline quality report: each stage from silver on feeds
      // 2+ consumers (its own suite + the next stage), so persist the
      // chain once. bronze_dup is NOT persisted: caching its wide
      // _raw_payload column costs more than the two recomputes of the
      // cheap ingest projection (measured 4.5s cache write vs ~0.7s/scan
      // at sf0.1)
      val bd = bronzeDup(s, dir)
      val sv = BronzeToSilver.transform(bd).persist()
      val st = Staging.stgTrades(sv).persist()
      val m1 = Ohlcv.ohlcv1m(st).persist()
      val h1 = Ohlcv.ohlcv1h(m1).persist()
      val dm = DailyMetrics.daily(h1).persist()
      val pl = PriceLatest.latest(st, m1, h1, dm)
      DataQuality.fullReport(bd, sv, m1, h1, dm, pl)
    },
    // -- core analytics (rows 15-18) --
    "q1_pricing_summary" -> ((s, dir) =>
      Analytics.q1PricingSummary(Tables.lineitem(s, dir))),
    "q3_shipping_priority" -> ((s, dir) =>
      Analytics.q3ShippingPriority(Tables.customer(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q5_region_revenue" -> ((s, dir) =>
      Analytics.q5RegionRevenue(Tables.region(s, dir), Tables.nation(s, dir),
        Tables.customer(s, dir), Tables.supplier(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "top_orders_window" -> ((s, dir) =>
      Analytics.topOrdersPerCustomer(Tables.orders(s, dir))),
    "q18_large_orders" -> ((s, dir) =>
      Analytics.q18LargeOrders(Tables.customer(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q17_small_orders" -> ((s, dir) =>
      Analytics.q17SmallOrders(Tables.part(s, dir), Tables.lineitem(s, dir))),
    "q4_order_priority" -> ((s, dir) =>
      Analytics.q4OrderPriority(Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    "q19_disjunctive_revenue" -> ((s, dir) =>
      Analytics.q19DisjunctiveRevenue(Tables.part(s, dir),
        Tables.lineitem(s, dir))),
    "q21_waiting_supplier" -> ((s, dir) =>
      Analytics.q21WaitingSupplier(Tables.supplier(s, dir),
        Tables.nation(s, dir), Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    "q22_global_sales_opp" -> ((s, dir) =>
      Analytics.q22GlobalSalesOpp(Tables.customer(s, dir),
        Tables.nation(s, dir), Tables.orders(s, dir))),
    "q16_supplier_parts" -> ((s, dir) =>
      Analytics.q16SupplierParts(Tables.part(s, dir),
        Tables.supplier(s, dir), Tables.lineitem(s, dir))),
    "q13_customer_distribution" -> ((s, dir) =>
      Analytics.q13CustomerDistribution(Tables.customer(s, dir),
        Tables.orders(s, dir))),
    "sales_cube" -> ((s, dir) => Analytics.salesCube(stg(s, dir))),
    "trade_cube" -> ((s, dir) => Analytics.tradeCube(stg(s, dir))),
    "trade_grouping_sets" -> ((s, dir) =>
      Analytics.tradeGroupingSets(stg(s, dir))),
    "trade_dow_pivot" -> ((s, dir) => Analytics.tradeDowPivot(stg(s, dir))),
    "customer_value_deciles" -> ((s, dir) =>
      Analytics.customerValueDeciles(Tables.orders(s, dir))),
    "q7_volume_shipping" -> ((s, dir) =>
      Analytics.q7VolumeShipping(Tables.supplier(s, dir),
        Tables.nation(s, dir), Tables.customer(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q8_market_share" -> ((s, dir) =>
      Analytics.q8MarketShare(Tables.region(s, dir), Tables.nation(s, dir),
        Tables.customer(s, dir), Tables.supplier(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir),
        Tables.part(s, dir))),
    "q2_min_cost_supplier" -> ((s, dir) =>
      Analytics.q2MinCostSupplier(Tables.part(s, dir),
        Tables.supplier(s, dir), Tables.nation(s, dir),
        Tables.lineitem(s, dir))),
    "q11_important_parts" -> ((s, dir) =>
      Analytics.q11ImportantParts(Tables.supplier(s, dir),
        Tables.nation(s, dir), Tables.lineitem(s, dir))),
    "q9_product_profit" -> ((s, dir) =>
      Analytics.q9ProductProfit(Tables.part(s, dir),
        Tables.supplier(s, dir), Tables.nation(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir))),
    "q12_priority_shipping" -> ((s, dir) =>
      Analytics.q12PriorityShipping(Tables.orders(s, dir),
        Tables.lineitem(s, dir))),
    "q20_potential_promo" -> ((s, dir) =>
      Analytics.q20PotentialPromo(Tables.part(s, dir),
        Tables.supplier(s, dir), Tables.nation(s, dir),
        Tables.lineitem(s, dir))),
    // metrics history + health rollup (the Grafana pipeline-health
    // analog): two full runs accumulate the `_metrics` time series,
    // then the dashboard query rolls it up. Deterministic columns only
    // (row counts, run counts, retries); quality_report's row count is
    // the check-suite size, already oracle-gated by `data_quality`.
    // The two pipeline executions are SETUP, materialized once per
    // (process, sf dir): repeated invocations — bench reps — measure
    // the DASHBOARD query over the shared `_metrics` history, not two
    // more end-to-end runs (those have their own pipeline_* bench
    // lines), and the history always holds exactly two runs, so the
    // oracle contract is invocation-count-invariant.
    "pipeline_health" -> { (s, dir) =>
      val out = healthHistoryDir.computeIfAbsent(dir, _ => {
        val o = java.nio.file.Files
          .createTempDirectory("graft-health").toString
        PipelineRun.run(s, dir, o)
        PipelineRun.run(s, dir, o)
        o
      })
      MetricsHistory.health(MetricsHistory.history(s, out))
        .filter(col("stage") =!= "quality_report")
        .select("stage", "n_runs", "total_rows", "last_rows",
          "total_retries")
    },
    // manifest column-stats data skipping: commit lineitem range-laid
    // over l_orderkey with per-file bounds, then read through the
    // file-pruning path — the oracle's full scan IS the answer-identity
    // proof (plan/IO assertions live in DataSkippingSpec)
    "snapshot_skipping_read" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-skip-key").toString
      val li = Tables.lineitem(s, dir)
        .repartitionByRange(8, col("l_orderkey"))
      SnapshotTable.commit(li, out, statsCols = Seq("l_orderkey"))
      SnapshotTable.readSkipping(s, out, "l_orderkey <= 500")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag")
    },
    // ORDER BY ... LIMIT over a graft table — the connector pushes the
    // TopN (SupportsPushDownTopN) and reads only the file prefix whose
    // recorded bounds + null counts can still hold the top rows (the
    // dashboard/serving shape; plan + IO proofs in TopNPushdownSpec)
    "topn_serving" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-topn-key").toString + "/t"
      val ev = Tables.events(s, dir)
        .select("event_id", "user_id", "event_type", "value")
        .repartitionByRange(8, col("event_id"))
      SnapshotTable.setNdvColumns(out, Seq("event_id"))
      SnapshotTable.commit(ev, out, statsCols = Seq("event_id"))
      s.read.format("graft").load(out)
        .orderBy(desc("event_id")).limit(100)
    },
    // the dashboard serving shape — WHERE eq-filter ORDER BY ... LIMIT
    // k: the eq filter prunes to its identity partition, and the TopN
    // prefix search composes over those survivors (the partition dir
    // PROVES the filter for every row, so its rows back the ≥k
    // guarantee); both prunings land on one scan
    "topn_serving_filtered" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-topnf-key").toString + "/t"
      val ev = Tables.events(s, dir)
        .select("event_id", "user_id", "event_type", "value")
        .repartitionByRange(8, col("event_id"))
      SnapshotTable.setNdvColumns(out, Seq("event_id"))
      SnapshotTable.commitAppend(ev, out, "event_type",
        statsCols = Seq("event_id"))
      s.read.format("graft").load(out)
        .filter(col("event_type") === "click")
        .orderBy(desc("event_id")).limit(100)
        .select("event_id", "user_id", "event_type", "value")
    },
    // initial-default column evolution (Iceberg v3 initial-default):
    // stage odd orders, add a defaulted column as a METADATA-ONLY
    // commit, append even orders carrying real values — pre-add files
    // read the default, post-add files their values (drop/carry/null
    // proofs live in DefaultValueSpec)
    "default_column_read" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-def-key").toString
      val ord = Tables.orders(s, dir)
      SnapshotTable.commitDelta(
        ord.filter(col("o_orderkey") % 2 === 1), out, "o_orderpriority")
      SnapshotTable.addColumn(s, out, "discount_rate",
        org.apache.spark.sql.types.DoubleType, Some("0.05"))
      SnapshotTable.commitAppend(
        ord.filter(col("o_orderkey") % 2 === 0)
          .withColumn("discount_rate", lit(0.1)),
        out, "o_orderpriority")
      SnapshotTable.read(s, out)
        .select("o_orderkey", "o_custkey", "o_totalprice",
          "o_orderpriority", "discount_rate")
    },
    // the format("graft") DSv2 connector end-to-end: a connector WRITE
    // (full commit + manifest stats), then a connector READ whose
    // filter Catalyst pushes across the DSv2 boundary into the
    // file-skipping path; Spark re-applies every pushed filter as a
    // residual, so the oracle's full scan is the answer-identity proof
    // (pushdown/pruning assertions live in GraftDataSourceSpec)
    "datasource_read" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-ds-key").toString + "/t"
      Tables.lineitem(s, dir).repartitionByRange(8, col("l_orderkey"))
        .write.format("graft").option("statsCols", "l_orderkey")
        .mode("overwrite").save(out)
      s.read.format("graft").load(out)
        .filter(col("l_orderkey") <= 500)
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag")
    },
    // runtime (dynamic) filtering through the connector: fact and dim
    // are BOTH graft tables; the dim's pushed date filter shrinks its
    // scan, and the runtime-filter rule narrows the fact scan with the
    // dim's join-key domain (IN set at small SF, min/max range past
    // maxKeys) — the Trino star-join pattern. The oracle's full-scan
    // join is the answer-identity proof; pruning assertions live in
    // GraftRuntimeFilterSpec.
    "star_join_connector" -> { (s, dir) =>
      val base = java.nio.file.Files
        .createTempDirectory("graft-star-key").toString
      Tables.lineitem(s, dir).repartitionByRange(8, col("l_orderkey"))
        .write.format("graft").option("statsCols", "l_orderkey")
        .mode("overwrite").save(base + "/fact")
      Tables.orders(s, dir).repartitionByRange(8, col("o_orderdate"))
        .write.format("graft")
        .option("statsCols", "o_orderdate,o_orderkey")
        .mode("overwrite").save(base + "/dim")
      val li = s.read.format("graft").load(base + "/fact")
      val ord = s.read.format("graft").load(base + "/dim")
        .filter(col("o_orderdate") >= lit("1996-03-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1996-07-01").cast("timestamp_ntz")
          && col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey", "o_orderpriority")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
          sum((col("l_extendedprice") * (lit(1.0d) - col("l_discount")))
            .cast("decimal(18,6)")).cast("decimal(18,6)").as("revenue"),
          count(lit(1)).as("n_items"))
    },
    // per-file bloom-filter skipping: lineitem HASH-scattered over
    // l_orderkey (min/max bounds span everything — only the bloom
    // probes can prune a point lookup), read through the file-pruning
    // path; oracle = the full-scan IN filter (IO assertions live in
    // BloomSkippingSpec)
    "snapshot_bloom_read" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-bloom-key").toString
      val li = Tables.lineitem(s, dir).repartition(8, col("l_orderkey"))
      SnapshotTable.commit(li, out, bloomCols = Seq("l_orderkey"))
      SnapshotTable.readSkipping(s, out, "l_orderkey IN (500, 700)")
        .select("l_orderkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_returnflag")
    },
    // merge-on-read position deletes: stage orders as a partitioned
    // snapshot, stack two MoR delete commits (zero data bytes moved —
    // only `_deletes` sidecars land), then read through the
    // delete-resolving path; the oracle is the source minus both
    // predicates (byte-identity proofs live in MorDeleteSpec)
    "mor_delete_read" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-mor-key").toString
      SnapshotTable.commitDelta(Tables.orders(s, dir), out,
        "o_orderpriority")
      SnapshotTable.deleteWhereMor(s, out,
        col("o_totalprice") > lit(400000.0))
      SnapshotTable.deleteWhereMor(s, out,
        col("o_orderstatus") === "F" && col("o_custkey") % 10 === 0)
      SnapshotTable.read(s, out)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
    },
    // incremental append scan: stage a third of orders, fast-append
    // the other two thirds in two commits, then read ONLY what
    // arrived after the first snapshot — cost is the new files, never
    // a two-snapshot diff (proofs incl. the append-only refusal and
    // delete/upsert interplay live in IncrementalReadSpec)
    "snapshot_incremental_read" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-incr-key").toString
      val ord = Tables.orders(s, dir)
      SnapshotTable.commitDelta(
        ord.filter(col("o_orderkey") % 3 === 1), out, "o_orderpriority")
      SnapshotTable.commitAppend(
        ord.filter(col("o_orderkey") % 3 === 2), out, "o_orderpriority")
      SnapshotTable.commitAppend(
        ord.filter(col("o_orderkey") % 3 === 0), out, "o_orderpriority")
      SnapshotTable.appendedBetween(s, out, 0L)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
    },
    // `readStream.format("graft")` end-to-end: a snapshot table
    // streamed by VERSION offsets through two REAL micro-batch
    // queries sharing one checkpoint (bootstrap snapshot, then an
    // incremental batch of only the appended rows) into a file sink —
    // every row arrives exactly once, so the landed files equal the
    // plain full table (offset/replay/rate-limit/refusal proofs live
    // in GraftStreamingSpec)
    "stream_table_read" -> { (s, dir) =>
      val tmp = java.nio.file.Files
        .createTempDirectory("graft-streamkey").toString
      val (root, out, cp) = (s"$tmp/t", s"$tmp/out", s"$tmp/cp")
      val ord = Tables.orders(s, dir)
      def drain(): Unit = {
        val q = s.readStream.format("graft").load(root)
          .writeStream.format("parquet")
          .option("checkpointLocation", cp)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start(out)
        q.awaitTermination()
      }
      SnapshotTable.commitAppend(
        ord.filter(col("o_orderkey") % 3 === 1), root, "o_orderpriority")
      drain()
      SnapshotTable.commitAppend(
        ord.filter(col("o_orderkey") % 3 =!= 1), root, "o_orderpriority")
      drain()
      s.read.parquet(out)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
    },
    // SCD Type-2 dimension history (the dbt-snapshot analog): three
    // per-product latest-price snapshots fold through init + two
    // merges — changed prices close/open versions at the snapshot's
    // latest trade time, unchanged snapshots are no-ops; the oracle
    // derives the same history as consecutive-run collapse over the
    // snapshot chain (merge semantics proofs live in ScdTwoSpec)
    "scd2_history" -> { (s, dir) =>
      val ev = Tables.events(s, dir).filter(col("event_id").isNotNull)
        .select(col("event_id").as("trade_id"),
          col("event_type").as("product_id"),
          col("value").as("price"), col("ts").as("trade_time"))
      def snap(cut: String) = ev
        .filter(expr(s"trade_time <= timestamp_ntz'$cut'"))
        .withColumn("_rn", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("product_id")
            .orderBy(col("trade_time").desc, col("trade_id").desc)))
        .filter(col("_rn") === 1)
        .select("product_id", "price", "trade_time")
      val d0 = ScdTwo.init(snap("2024-01-10 00:00:00"), "trade_time")
      val d1 = ScdTwo.merge(d0, snap("2024-01-20 00:00:00"),
        "product_id", "trade_time")
      val d2 = ScdTwo.merge(d1, snap("2024-01-30 00:00:00"),
        "product_id", "trade_time")
      d2.select("product_id", "price", "valid_from", "valid_to",
        "is_current")
    },
    // BPE tokenizer training: 8 greedy merges learned over the
    // documents word inventory — the oracle replays the IDENTICAL
    // iterations (pair count → argmax with the (count DESC, l, r)
    // tie-break → leftmost-first merge pass) in DuckDB, so a hash
    // match proves the whole trainer step for step
    "bpe_merges" -> ((s, dir) => Bpe.train(Tables.documents(s, dir), 8)),
    // ...and corpus encoding under those learned merges: per-doc BPE
    // token counts (train → encode end-to-end through the oracle)
    "bpe_tokenize" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Bpe.encode(docs, Bpe.trainMerges(docs, 8).map(m => (m._1, m._2)))
    },
    // unigram-LM (SentencePiece family) tokenizer: the piece table
    // after 2 hard-EM rounds over the word inventory — Viterbi under
    // the exact-integer lexicographic objective, replayed bit-for-bit
    // by the DuckDB DP oracle (libm-free determinism)
    "unigram_train" -> ((s, dir) =>
      Unigram.train(Tables.documents(s, dir))),
    // ...and corpus encoding under the trained pieces: per-doc token
    // counts (train → encode end-to-end through the oracle)
    "unigram_tokenize" -> { (s, dir) =>
      val docs = Tables.documents(s, dir)
      Unigram.encode(docs, Unigram.trainWeights(docs))
    },
    // fuzzy (edit-distance) join: near-duplicate part names within 2
    // edits via the q-gram inverted-index prefilter + levenshtein
    // verify; the oracle is the NAIVE all-pairs join, so a hash match
    // proves the prefilter is complete (short-string and
    // cross-table proofs live in FuzzyJoinSpec)
    "fuzzy_join" -> ((s, dir) =>
      FuzzyJoin.selfPairs(Tables.part(s, dir), "p_name", maxDist = 2)),
    // the STORED-inventory fuzzy join: the gram-statistics sidecar
    // (collectGramStats, the collectNdv pattern) answers every plan
    // gate from metadata and supplies the signature ranking as one
    // sidecar join — zero per-query pricing jobs; the oracle is the
    // SAME naive all-pairs join, so the hash match proves the stored
    // path's completeness too
    "fuzzy_join_stored" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-fuzzy-key").toString + "/t"
      SnapshotTable.commit(
        Tables.part(s, dir).select("p_partkey", "p_name"), out)
      FuzzyJoin.collectGramStats(s, out, "p_name", maxDist = 2)
      FuzzyJoin.selfPairsStored(s, out, "p_name", maxDist = 2)
    },
    // incremental materialized-view maintenance: an aggregate mart
    // over orders refreshes by applying the CDC delta (one upsert +
    // one MoR delete) — never re-aggregating the base; the oracle
    // recomputes the aggregate from scratch over the merged table, so
    // a hash match proves increment ≡ full recompute (equivalence /
    // zero-group proofs live in MaterializedViewSpec)
    "mv_incremental" -> { (s, dir) =>
      val base = java.nio.file.Files
        .createTempDirectory("graft-mv-key-base").toString
      val mv = java.nio.file.Files
        .createTempDirectory("graft-mv-key").toString
      val ord = Tables.orders(s, dir)
      SnapshotTable.commitDelta(ord, base, "o_orderpriority")
      MaterializedView.create(s, base, mv, "o_orderkey",
        Seq("o_orderpriority"), Seq("o_totalprice"))
      val batch = ord.filter(col("o_custkey") % 7 === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      SnapshotTable.upsertMor(s, base, "o_orderpriority", batch,
        Seq("o_orderkey"))
      SnapshotTable.deleteWhereMor(s, base, col("o_custkey") % 11 === 0)
      MaterializedView.refresh(s, base, mv)
      SnapshotTable.read(s, mv)
        .select(col("o_orderpriority"), col("n_rows"),
          col("o_totalprice_sum").cast("double").as("total_sum"))
    },
    // hidden partitioning (Iceberg partition transforms): events land
    // under a days(ts)-DERIVED directory layout — the query names only
    // the source column `ts`, never the layout, and the day
    // directories prune anyway; the oracle's full-scan filter is the
    // answer-identity proof (pruning/IO assertions live in
    // HiddenPartitionSpec)
    "hidden_partition_read" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-hidden-key").toString
      val ev = Tables.events(s, dir)
        .select("event_id", "event_type", "value", "ts")
      SnapshotTable.commitDelta(ev, out, "days(ts)")
      SnapshotTable.readSkipping(s, out,
        "ts >= timestamp'2024-01-05 00:00:00' AND " +
          "ts < timestamp'2024-01-08 00:00:00'")
        .select("event_id", "event_type", "value", "ts")
    },
    // metadata-only COUNT(*): the manifests answer the count without
    // a data scan — recorded per-file rows minus live position-delete
    // rows; oracle = the full-scan count after the same delete
    // (fallback/eq-delete proofs live in FastCountSpec)
    "fast_count" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-fc-key").toString
      SnapshotTable.commitDelta(Tables.orders(s, dir), out,
        "o_orderpriority")
      SnapshotTable.deleteWhereMor(s, out,
        col("o_totalprice") > lit(400000.0))
      import s.implicits._
      Seq(SnapshotTable.fastCount(s, out)).toDF("n_rows")
    },
    // MULTI-column hidden partitioning: a two-field spec (day
    // transform × product bucket) nests directory levels; the read
    // names only the SOURCE columns and both levels prune; oracle =
    // the full-scan filter (layout answer-invisible; nesting/pruning
    // proofs live in MultiPartitionSpec)
    "multi_partition_read" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-multi-key").toString
      val ev = Tables.events(s, dir)
        .select("event_id", "event_type", "value", "ts")
      SnapshotTable.commitDelta(ev, out, "days(ts),bucket(4,event_type)")
      SnapshotTable.readSkipping(s, out,
        "ts >= timestamp'2024-01-12 00:00:00' AND " +
          "ts < timestamp'2024-01-14 00:00:00' AND event_type = 'click'")
        .select("event_id", "event_type", "value", "ts")
    },
    // partition-spec evolution: stage 3/4 of orders laid out by
    // priority, evolve the spec (metadata-only), append the last
    // quarter laid out by STATUS, then read the mixed-era table —
    // which must equal the plain union of both slices (layout eras
    // must be answer-invisible; pruning/migration proofs live in
    // SpecEvolutionSpec)
    "spec_evolution_read" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-specevo-key").toString
      val ord = Tables.orders(s, dir)
      SnapshotTable.commitDelta(
        ord.filter(col("o_orderkey") % 4 =!= 0), out, "o_orderpriority")
      SnapshotTable.evolvePartitionSpec(out, "o_orderstatus")
      SnapshotTable.commitAppend(
        ord.filter(col("o_orderkey") % 4 === 0), out, "o_orderstatus")
      SnapshotTable.read(s, out)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
    },
    // merge-on-read EQUALITY deletes + the O(batch) CDC upsert: stage
    // orders partitioned, upsert a batch (doubled-price updates keyed
    // by o_orderkey) in ONE commit — appended rows + an equality-delete
    // sidecar of the batch's keys; the strict sequence rule masks only
    // the OLDER twins. The oracle is plain MERGE semantics: batch rows
    // plus every base row whose key the batch does not carry
    // (sidecar resolution must be invisible to the answer; byte-level
    // proofs live in EqDeleteSpec)
    "upsert_mor" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-upsert-key").toString
      val ord = Tables.orders(s, dir)
      SnapshotTable.commitDelta(ord, out, "o_orderpriority")
      val batch = ord.filter(col("o_custkey") % 7 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      SnapshotTable.upsertMor(s, out, "o_orderpriority", batch,
        Seq("o_orderkey"))
      SnapshotTable.read(s, out)
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
    },
    // SQL row-level DML end to end: MERGE INTO (upsert shape → the
    // O(batch) MoR commit) then UPDATE (partition-pruned CoW delta),
    // both through the injected post-hoc rule. The batch updates
    // custkey%5 rows (tripled price, status 'M') and inserts fresh
    // keys for custkey%11 rows; the UPDATE then bumps every 'M' price
    // by 1. Oracle replays the same chain as plain SQL set logic.
    "sql_merge_update" -> { (s, dir) =>
      val wh = java.nio.file.Files
        .createTempDirectory("graft-dml-key").toString
      s.conf.set("spark.sql.catalog.graft_dml_key",
        "graft.sources.GraftSqlCatalog")
      s.conf.set("spark.sql.catalog.graft_dml_key.warehouse", wh)
      val ord = Tables.orders(s, dir)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(wh, "db"))
      SnapshotTable.commitDelta(ord, s"$wh/db/t", "o_orderpriority")
      ord.filter(col("o_custkey") % 5 === 0)
        .withColumn("o_orderstatus", lit("M"))
        .withColumn("o_totalprice", col("o_totalprice") * 3)
        .unionByName(ord.filter(col("o_custkey") % 11 === 0)
          .withColumn("o_orderkey", col("o_orderkey") + 30000000L)
          .withColumn("o_orderstatus", lit("N")))
        .createOrReplaceTempView("sql_merge_update_src")
      s.sql("""MERGE INTO graft_dml_key.db.t AS t
        |USING sql_merge_update_src AS src ON t.o_orderkey = src.o_orderkey
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      s.sql("""UPDATE graft_dml_key.db.t
        |SET o_totalprice = o_totalprice + 1
        |WHERE o_orderstatus = 'M'""".stripMargin)
      s.table("graft_dml_key.db.t")
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
    },
    // CONDITIONAL SQL MERGE — the Debezium CDC routing shape: matched
    // 'd' ops delete, matched 'u' ops take a PARTIAL update (price +
    // status only; the source carries a shifted o_orderdate the
    // statement must NOT apply — full-row application would hash-
    // mismatch), non-matched non-'d' ops insert. One zero-rewrite
    // merge-on-read commit; oracle replays the routing as set logic.
    "sql_merge_conditional" -> { (s, dir) =>
      val wh = java.nio.file.Files
        .createTempDirectory("graft-dmlc-key").toString
      s.conf.set("spark.sql.catalog.graft_dmlc_key",
        "graft.sources.GraftSqlCatalog")
      s.conf.set("spark.sql.catalog.graft_dmlc_key.warehouse", wh)
      val ord = Tables.orders(s, dir)
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(wh, "db"))
      SnapshotTable.commitDelta(ord, s"$wh/db/t", "o_orderpriority")
      val upd = ord
        .filter(col("o_custkey") % 5 === 0 && col("o_custkey") % 13 =!= 0)
        .withColumn("o_totalprice", col("o_totalprice") * 3)
        .withColumn("o_orderdate", date_add(col("o_orderdate"), 1000))
        .withColumn("op", lit("u"))
      val dels = ord.filter(col("o_custkey") % 13 === 0)
        .withColumn("op", lit("d"))
      val ins = ord.filter(col("o_custkey") % 11 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 30000000L)
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("op", lit("c"))
      upd.unionByName(dels).unionByName(ins)
        .createOrReplaceTempView("sql_merge_conditional_src")
      s.sql("""MERGE INTO graft_dmlc_key.db.t AS t
        |USING sql_merge_conditional_src AS src
        |ON t.o_orderkey = src.o_orderkey
        |WHEN MATCHED AND src.op = 'd' THEN DELETE
        |WHEN MATCHED AND src.op = 'u' THEN UPDATE
        |  SET o_totalprice = src.o_totalprice, o_orderstatus = 'M'
        |WHEN NOT MATCHED AND src.op <> 'd' THEN INSERT
        |  (o_orderkey, o_custkey, o_orderstatus, o_totalprice,
        |   o_orderdate, o_orderpriority)
        |  VALUES (src.o_orderkey, src.o_custkey, src.o_orderstatus,
        |   src.o_totalprice, src.o_orderdate, src.o_orderpriority)"""
        .stripMargin)
      s.table("graft_dmlc_key.db.t")
        .select("o_orderkey", "o_custkey", "o_orderstatus",
          "o_totalprice", "o_orderdate", "o_orderpriority")
    },
    "q6_forecast_revenue" -> ((s, dir) =>
      Analytics.q6ForecastRevenue(Tables.lineitem(s, dir))),
    "q10_returned_items" -> ((s, dir) =>
      Analytics.q10ReturnedItems(Tables.customer(s, dir),
        Tables.orders(s, dir), Tables.lineitem(s, dir),
        Tables.nation(s, dir))),
    "q14_promo_revenue" -> ((s, dir) =>
      Analytics.q14PromoRevenue(Tables.part(s, dir),
        Tables.lineitem(s, dir))),
    "q15_top_supplier" -> ((s, dir) =>
      Analytics.q15TopSupplier(Tables.supplier(s, dir),
        Tables.lineitem(s, dir))),
    // -- LLM training-data pipeline (rows 19-29) --
    "dedup_exact" -> ((s, dir) => Dedup.exact(Tables.documents(s, dir))),
    "dedup_substring" -> ((s, dir) =>
      Dedup.exactSubstring(Tables.documents(s, dir))),
    "substring_clean" -> ((s, dir) => {
      val d = Tables.documents(s, dir)
      Dedup.cutSpans(d, Dedup.exactSubstring(d))
    }),
    "chunk_dedup" -> ((s, dir) =>
      ChunkDedup.spans(Tables.documents(s, dir))),
    "dedup_ngram_jaccard" -> ((s, dir) =>
      Dedup.ngramJaccard(Tables.documents(s, dir))),
    "dedup_clusters" -> ((s, dir) =>
      Dedup.clusters(Dedup.ngramJaccard(Tables.documents(s, dir)))),
    "dedup_clusters_twostar" -> ((s, dir) =>
      Dedup.clustersTwoStar(Dedup.ngramJaccard(Tables.documents(s, dir)))),
    "dedup_cluster_stats" -> ((s, dir) =>
      Dedup.clusterStats(
        Dedup.clusters(Dedup.ngramJaccard(Tables.documents(s, dir))))),
    "dedup_minhash" -> ((s, dir) => Dedup.minhashLsh(Tables.documents(s, dir))),
    "dedup_simhash" -> ((s, dir) => Dedup.simhash(Tables.documents(s, dir))),
    "dedup_embedding" -> ((s, dir) =>
      Similarity.nearDupPairs(Tables.embeddings(s, dir))),
    // SemDeDup (cluster-scoped semantic near-dup removal): pairwise
    // cosine ONLY within a trained k-means cluster — the cluster valve
    // that keeps semantic dedup sub-quadratic at corpus scale
    "semantic_dedup" -> ((s, dir) =>
      Similarity.semanticDedup(Tables.embeddings(s, dir))),
    // PII redaction: the synthetic corpus is digit-free, so the key
    // plants one email / IP / card-shaped id per doc with the SAME
    // deterministic expression the oracle uses, then hash-checks the
    // fully redacted strings + per-class counts (tricky-case behavior
    // is pinned by PiiRedactSpec)
    // α=0.5 temperature mixture plan over the curated sources (the
    // data-mixing step between curation and training)
    "mixture_plan" -> ((s, dir) =>
      Mixture.plan(Tables.documents(s, dir))),
    "pii_redact" -> { (s, dir) =>
      val aug = Tables.documents(s, dir).withColumn("text",
        concat(col("text"), lit(" contact user"),
          col("doc_id").cast("string"),
          lit("@example.com from 10.1."),
          (col("doc_id") % 256).cast("string"),
          lit(".7 card "),
          (col("doc_id") + lit(4000000000000000L)).cast("string")))
      PiiRedact.redact(aug)
    },
    "embedding_dup_clusters" -> ((s, dir) =>
      // the same min-label-propagation CC as dedup_clusters, over the
      // embedding near-dup graph instead of the shingle one
      Dedup.clusters(
        Similarity.nearDupPairs(Tables.embeddings(s, dir))
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
        .select(col("doc_id").as("vec_id"), col("cluster_id"),
          col("is_canonical"))),
    "ann_topk" -> ((s, dir) => Similarity.annTopK(Tables.embeddings(s, dir))),
    "ann_topk_quantized" -> ((s, dir) =>
      Similarity.annTopKQuantized(Tables.embeddings(s, dir))),
    "ann_topk_pq" -> ((s, dir) =>
      Similarity.annTopKPq(Tables.embeddings(s, dir))),
    "ann_topk_bucketed" -> ((s, dir) =>
      Similarity.annTopKBucketed(Tables.embeddings(s, dir))),
    "ann_recall" -> { (s, dir) =>
      // index-quality gate: exact brute-force top-k vs the IVF probe
      // path; emb feeds both sides, so materialize it once
      val emb = Tables.embeddings(s, dir).persist()
      Similarity.annRecall(Similarity.annTopK(emb), Similarity.ivfTopK(emb))
    },
    "lang_id" -> ((s, dir) => TextAnalysis.langId(s, Tables.documents(s, dir))),
    "corpus_stats" -> ((s, dir) =>
      TextAnalysis.corpusStats(s, Tables.documents(s, dir))),
    "text_quality" -> ((s, dir) => TextAnalysis.quality(Tables.documents(s, dir))),
    "token_count" -> ((s, dir) => TextAnalysis.tokenCount(Tables.documents(s, dir))),
    "doc_fingerprint" -> ((s, dir) =>
      TextAnalysis.fingerprint(Tables.documents(s, dir))),
    "multimodal_meta" -> ((s, dir) =>
      Multimodal.metadata(Tables.documents(s, dir))),
    "sessionize" -> ((s, dir) =>
      graft.streaming.Sessionize.sessionsExact(s, dir)),
    "vocab_topk" -> ((s, dir) => TextAnalysis.vocabTopK(Tables.documents(s, dir))),
    "text_clean" -> ((s, dir) => TextAnalysis.clean(Tables.documents(s, dir))),
    "dataset_split" -> ((s, dir) =>
      TextAnalysis.datasetSplit(Tables.documents(s, dir))),
    "stratified_sample" -> ((s, dir) =>
      TextAnalysis.stratifiedSample(Tables.documents(s, dir))),
    "ivf_topk" -> ((s, dir) => Similarity.ivfTopK(Tables.embeddings(s, dir))),
    // IVF-PQ: probe-pruned candidate lists × ADC over the codes table —
    // the two ANN cost levers composed (FAISS IVFPQ, by_residual=false)
    "ivfpq_topk" -> ((s, dir) =>
      Similarity.ivfPqTopK(Tables.embeddings(s, dir))),
    "ivf_topk_trained" -> { (s, dir) =>
      // one deterministic Lloyd iteration trains the coarse quantizer
      // (ordered-fold means — bit-identical on the oracle side), then
      // the same IVF probe path as ivf_topk runs over it
      val emb = Tables.embeddings(s, dir)
      Similarity.ivfTopK(emb,
        centroids = Some(Similarity.trainCentroidsOrdered(emb, 16, 1)))
    },
    "event_funnel" -> ((s, dir) => EventAnalytics.funnel(Tables.events(s, dir))),
    "retention_cohorts" -> ((s, dir) =>
      EventAnalytics.retentionCohorts(Tables.events(s, dir))),
    "token_percentiles" -> ((s, dir) =>
      TextAnalysis.tokenPercentiles(Tables.documents(s, dir))),
    "repetition_quality" -> ((s, dir) =>
      TextAnalysis.repetition(Tables.documents(s, dir))),
    "bigram_lm" -> ((s, dir) =>
      TextAnalysis.bigramLm(Tables.documents(s, dir))),
    "bigram_doc_score" -> ((s, dir) =>
      TextAnalysis.bigramDocScore(Tables.documents(s, dir))),
    "decontaminate" -> ((s, dir) =>
      TextAnalysis.decontaminate(Tables.documents(s, dir))),
    "sequence_packing" -> ((s, dir) =>
      TextAnalysis.sequencePacking(Tables.documents(s, dir))),
    // training export plan: deterministic md5 shuffle → shard → greedy
    // pack, all in one exchange (export/manifest in TrainingExportSpec)
    "training_shards" -> ((s, dir) =>
      TrainingExport.plan(Tables.documents(s, dir))),
    // deterministic mixture materialization: every source sampled (or
    // repeated) at its alpha-temperature epochs rate, no randomness
    "mixture_sample" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      TrainingExport.sampleToRates(docs,
          Mixture.plan(docs).select("source", "epochs"))
        .select("doc_id", "source", "epoch")
    }),
    "doc_chunks" -> ((s, dir) =>
      TextAnalysis.docChunks(Tables.documents(s, dir))),
    "curation_report" -> ((s, dir) =>
      TextAnalysis.curationReport(Tables.documents(s, dir))),
    "tf_idf" -> ((s, dir) => Retrieval.tfIdf(Tables.documents(s, dir))),
    "bm25_search" -> ((s, dir) =>
      Retrieval.bm25Search(Tables.documents(s, dir))),
    "hybrid_search" -> ((s, dir) =>
      Retrieval.hybridSearch(Tables.documents(s, dir),
        Tables.embeddings(s, dir))),
    // BM25 over the STORED inverted index (indexCorpus, the
    // collectGramStats pattern): the query reads ~|query| posting
    // rows, never the corpus; the oracle is the SAME corpus-scan BM25
    // SQL, so the hash match proves index path ≡ scan path
    "bm25_stored" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-bm25-key").toString + "/t"
      SnapshotTable.commit(Tables.documents(s, dir), out)
      Retrieval.indexCorpus(s, out)
      Retrieval.bm25SearchStored(s, out)
    },
    // INCREMENTAL index maintenance end-to-end: the corpus lands as a
    // RANGE-disjoint append pair (v0 full build, v1 a delta SEGMENT
    // over only the appended rows — the Lucene segment model), then a
    // MERGE-upsert edits every doc_id%7==3 doc, absorbed as a
    // TOMBSTONED delta (the liveDocs model) — never a rebuild. The
    // oracle is the corpus-scan BM25 over the POST-UPSERT table; the
    // asserts below keep the key honest: both maintenance steps must
    // land as segments (a silent full rebuild would pass the hash
    // trivially) and the upsert must leave a tombstone delta.
    "bm25_incremental" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-bm25-inc").toString + "/t"
      val docs = Tables.documents(s, dir)
      val r = docs.agg(min("doc_id"), max("doc_id")).head()
      val cut = (r.getLong(0) + r.getLong(1)) / 2L
      SnapshotTable.commitAppend(
        docs.filter(col("doc_id") <= cut), out, "source")
      Retrieval.indexCorpus(s, out)
      SnapshotTable.commitAppend(
        docs.filter(col("doc_id") > cut), out, "source")
      Retrieval.indexCorpusDelta(s, out)
      val batch = docs.filter(pmod(col("doc_id"), lit(7L)) === 3L)
        .withColumn("text", concat(col("text"), lit(" merge vector merge")))
      SnapshotTable.upsertMor(s, out, "source", batch, Seq("doc_id"))
      Retrieval.indexCorpusDelta(s, out)
      require(Retrieval.indexSegments(out).count(_.contains("seg-")) == 2,
        "incremental maintenance fell back to a full rebuild")
      require(Retrieval.indexTombs(out).nonEmpty,
        "the upsert left no tombstone delta")
      Retrieval.bm25SearchStored(s, out)
    },
    // BATCHED serving: a query SET scored against the stored index in
    // ONE job (union-of-terms posting read, broadcast query table,
    // one per-query top-k window) — the oracle replays the same
    // global-df + per-query fold + partitioned rank in SQL
    "bm25_search_batch" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-bm25-batch").toString + "/t"
      SnapshotTable.commit(Tables.documents(s, dir), out)
      Retrieval.indexCorpus(s, out)
      Retrieval.bm25SearchStoredBatch(s, out)
    },
    // exact-phrase search over the POSITIONAL postings: the query
    // reads only the phrase terms' posting rows; the oracle counts
    // adjacent-token runs over the raw text — a hash match proves the
    // positional index reproduces overlap-counting position arithmetic
    "phrase_search" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-phrase-key").toString + "/t"
      SnapshotTable.commit(Tables.documents(s, dir), out)
      Retrieval.indexCorpus(s, out)
      Retrieval.phraseSearch(s, out)
    },
    // ordered PROXIMITY phrase search over the same positional
    // postings ("merge group"~2, Lucene's sloppy PhraseQuery): the
    // consecutive-gap extension arithmetic, end-position occurrence
    // counts — the oracle counts windowed co-occurrence over raw
    // text, so a hash match proves the positional index generalizes
    // beyond exact adjacency
    "phrase_search_slop" -> { (s, dir) =>
      val out = java.nio.file.Files
        .createTempDirectory("graft-slop-key").toString + "/t"
      SnapshotTable.commit(Tables.documents(s, dir), out)
      Retrieval.indexCorpus(s, out)
      Retrieval.phraseSearch(s, out, slop = 2)
    },
    // the fully STORED hybrid: inverted-index lexical leg + persisted
    // IVF dense leg (deterministic lowest-16 quantizer, nprobe=4 —
    // the ivf_topk config), RRF-fused; the oracle replays both legs
    "hybrid_search_stored" -> { (s, dir) =>
      val base = java.nio.file.Files
        .createTempDirectory("graft-hybrid-key").toString
      val docsRoot = s"$base/docs"
      val ivfRoot = s"$base/ivf"
      SnapshotTable.commit(Tables.documents(s, dir), docsRoot)
      Retrieval.indexCorpus(s, docsRoot)
      IncrementalIvf.appendBatch(s, ivfRoot,
        Tables.embeddings(s, dir).select("vec_id", "embedding"))
      Retrieval.hybridSearchStored(s, docsRoot, ivfRoot,
        Tables.embeddings(s, dir))
    }
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = Oracles.all
}
