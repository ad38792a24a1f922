package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DecimalType, LongType}

import graft.operators._
import graft.sources.Tables

/** Bronze → Silver → marts pipeline semantics on sf0.001. */
class PipelineSpec extends GraftSuite {

  private lazy val events = Tables.events(spark, sf)
  private lazy val bronze = Bronze.ingest(events)
  private lazy val bronzeDup = Bronze.withRedeliveries(bronze)
  private lazy val silver = BronzeToSilver.transform(bronzeDup)
  private lazy val stg = Staging.stgTrades(silver)

  test("bronze ingest maps every event and derives the synthetic ingest lag") {
    assert(bronze.count() === events.count())
    val bad = bronze.filter(
      expr("timestampdiff(SECOND, trade_time, ingested_at) <> trade_id % 600"))
    assert(bad.count() === 0)
  }

  test("redeliveries add one duplicate per 10th trade; dedup removes them all") {
    val n = bronze.count()
    val nDup = bronzeDup.count()
    assert(nDup === n + bronze.filter(col("trade_id") % 10 === 0).count())
    val deduped = BronzeToSilver.dedup(bronzeDup)
    assert(deduped.count() === n)
    // keep-earliest: no kept row is a redelivery (lag stays < 900 + 600)
    val kept = deduped.filter(
      expr("timestampdiff(SECOND, trade_time, ingested_at) <> trade_id % 600"))
    assert(kept.count() === 0)
  }

  test("silver casts money to DECIMAL(18,8) and flags late arrivals at 300s") {
    val sch = silver.schema
    assert(sch("price").dataType === DecimalType(18, 8))
    assert(sch("size").dataType === DecimalType(18, 8))
    assert(sch("_source_latency_ms").dataType === LongType)
    assert(sch("_is_late_arrival").dataType === BooleanType)
    val wrong = silver.filter(
      col("_is_late_arrival") =!= (col("_source_latency_ms") > 300000L))
    assert(wrong.count() === 0)
    assert(silver.filter(col("trade_id").isNull || col("price") <= 0).count() === 0)
  }

  test("incremental read keeps exactly the 2h lookback from max ingest") {
    val inc = BronzeToSilver.incrementalRead(bronzeDup, 2)
    val mx = bronzeDup.agg(max("ingested_at")).head().getAs[java.time.LocalDateTime](0)
    val expected = bronzeDup
      .filter(col("ingested_at") >= lit(mx.minusHours(2))).count()
    assert(inc.count() === expected && inc.count() > 0)
  }

  test("partitioned bronze write partition-prunes the incremental read (plan-asserted)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-part").toString
    Bronze.writePartitioned(bronzeDup, tmp)

    val inc = BronzeToSilver.incrementalReadPartitioned(spark, tmp, 2)
    val scans = inc.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    assert(scans.forall(_.partitionFilters.nonEmpty),
      "scan must carry PartitionFilters on _ingestion_date")
    // pruning is real: the scan selects strictly fewer date partitions
    // than the table holds
    val allDates = spark.read.parquet(tmp)
      .select("_ingestion_date").distinct().count()
    assert(scans.head.selectedPartitions.partitionCount < allDates)

    // and the pruned read returns exactly the in-memory incremental rows
    val ref = BronzeToSilver.incrementalRead(bronzeDup, 2)
    val colsSorted = ref.columns.sorted.toSeq.map(col)
    val got = inc.select(colsSorted: _*).orderBy("trade_id", "ingested_at")
      .collect().map(_.toSeq).toSeq
    val want = ref.select(colsSorted: _*).orderBy("trade_id", "ingested_at")
      .collect().map(_.toSeq).toSeq
    assert(got === want && got.nonEmpty)
  }

  test("partitioned silver write round-trips and lays out by _trade_date") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-part-silver").toString
    BronzeToSilver.writePartitioned(silver, tmp)
    val back = spark.read.parquet(tmp)
    assert(back.count() === silver.count())
    assert(back.columns.toSet === silver.columns.toSet)
    // physical layout: one directory per trade date
    val dirs = new java.io.File(tmp).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("_trade_date="))
    assert(dirs.length === silver.select("_trade_date").distinct().count())
  }

  test("merge upsert: source wins on match, target survives otherwise") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("trade_id", "product_id", "price")
    val source = Seq((2L, "b", 99.0), (4L, "d", 40.0))
      .toDF("trade_id", "product_id", "price")
    val merged = MergeUpsert.merge(target, source, "trade_id")
    val rows = merged.orderBy("trade_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    assert(rows.toSeq === Seq((1L, 10.0), (2L, 99.0), (3L, 30.0), (4L, 40.0)))
  }

  test("end-to-end pipeline run materializes every stage and gates green") {
    val out = java.nio.file.Files.createTempDirectory("graft-e2e").toString
    val reportRows = PipelineRun.run(spark, sf, out).collect()
    val report = reportRows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(report.keySet === PipelineRun.Stages.toSet)
    // marts materialized with rows, and each equals its direct
    // recomputation from the materialized silver
    assert(PipelineRun.Stages.forall(report(_) > 0))
    // row counts come from the write job's OWN output metrics, never a
    // re-scan — they must still equal what actually landed on disk
    PipelineRun.Stages.foreach { st =>
      assert(report(st) === spark.read.parquet(s"$out/$st").count(),
        s"metrics-reported rows for $st must match the written table")
    }
    // clean run: every stage succeeded first try
    assert(reportRows.forall(_.getAs[Int]("attempts") === 1))
    val silverBack = spark.read.parquet(s"$out/silver")
    assert(silverBack.count() === silver.count())
    val m1Back = spark.read.parquet(s"$out/ohlcv_1m")
    assert(m1Back.count() ===
      Ohlcv.ohlcv1m(Staging.stgTrades(silverBack)).count())
    // quality gate is green on clean testdata (failOnViolations did not
    // throw above); any persisted violations are warn-severity only
    // (silver positivity — staging filters those rows downstream)
    val rep = spark.read.parquet(s"$out/quality_report")
    val reds = rep.filter(col("violations") > 0)
      .select("table_name", "check_name").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(reds.forall(DataQuality.warnChecks))
    assert(rep.count() === 34)
    // silver landed partitioned by trade date (the pruning axis)
    assert(new java.io.File(s"$out/silver").listFiles()
      .exists(f => f.isDirectory && f.getName.startsWith("_trade_date=")))
    // fail-fast: poison the raw events (null event_type → null
    // product_id) so an ERROR-severity check goes red — the RUNNER
    // itself must throw, after persisting the red report for debugging
    val poisoned = events.withColumn("event_type",
      when(col("event_id") % 7 === 0, lit(null).cast("string"))
        .otherwise(col("event_type")))
    val out2 = java.nio.file.Files.createTempDirectory("graft-e2e-red").toString
    val e = intercept[IllegalStateException] {
      PipelineRun.run(spark, sf, out2, eventsOverride = Some(poisoned))
    }
    assert(e.getMessage.contains("quality gate failed"))
    assert(e.getMessage.contains("not_null_product_id"))
    assert(spark.read.parquet(s"$out2/quality_report")
      .filter(col("violations") > 0).count() > 0)
  }

  test("merge upsert: added source columns widen the target, drops rejected") {
    import spark.implicits._
    val target = Seq((1L, "a"), (2L, "b")).toDF("trade_id", "product_id")
    // producer added a `venue` field: evolved source
    val source = Seq((2L, "B", "cbx"), (3L, "c", "okd"))
      .toDF("trade_id", "product_id", "venue")
    val merged = MergeUpsert.merge(target, source, "trade_id")
    assert(merged.columns.toSeq === Seq("trade_id", "product_id", "venue"))
    val rows = merged.orderBy("trade_id").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    // pre-existing target-only row carries NULL in the new column
    assert(rows.toSeq === Seq((1L, "a", None), (2L, "B", Some("cbx")),
      (3L, "c", Some("okd"))))
    // a source missing a target column is a drop -> rejected loudly
    val narrow = Seq((5L)).toDF("trade_id")
    val e = intercept[IllegalArgumentException] {
      MergeUpsert.merge(target, narrow, "trade_id")
    }
    assert(e.getMessage.contains("product_id"))
  }

  test("incremental run lands identical to a full rebuild, rewriting only touched partitions") {
    import scala.jdk.CollectionConverters._
    import java.nio.file.{Files, Paths}
    val outFull = Files.createTempDirectory("graft-incr-full").toString
    val outInc = Files.createTempDirectory("graft-incr").toString

    // arrival-ordered split: first ~70% by ingest time, rest arrives later
    val ing = expr("timestampadd(SECOND, cast(event_id % 600 as int), ts)")
    val n = events.count()
    val cut = events.select(ing.as("_ing")).orderBy("_ing")
      .limit((n * 7 / 10).toInt).agg(max("_ing")).head()
      .getAs[java.time.LocalDateTime](0)
    val e1 = events.filter(ing <= lit(cut))
    val e2 = events.filter(ing > lit(cut))
    assert(e1.count() > 0 && e2.count() > 0)

    PipelineRun.run(spark, sf, outFull)
    PipelineRun.run(spark, sf, outInc, eventsOverride = Some(e1))
    val wm1 = PipelineRun.readWatermark(outInc).get

    // expected touched dates: trade dates inside the incremental window
    // (everything ingested after watermark − lookback, batch + overlap)
    val expectedWm = Bronze.withRedeliveries(Bronze.ingest(e1))
      .agg(max("ingested_at")).head().getAs[java.time.LocalDateTime](0)
    assert(wm1 === expectedWm)
    val affected = silver
      .filter(col("ingested_at") > lit(wm1.minusHours(2)))
      .select("_trade_date").distinct().collect().map(_.getDate(0).toString).toSet
    val allDates = silver.select("_trade_date").distinct().count()
    assert(affected.nonEmpty && affected.size < allDates,
      "split must leave untouched date partitions for the pruning check")

    def partFiles(root: String): Map[String, Long] = {
      val base = Paths.get(root)
      val s = Files.walk(base)
      try s.iterator().asScala.filter(Files.isRegularFile(_))
        .map(p => base.relativize(p).toString ->
          Files.getLastModifiedTime(p).toMillis)
        .filter(_._1.startsWith("_trade_date=")).toMap
      finally s.close()
    }
    val before = partFiles(s"$outInc/silver")

    val rep = PipelineRun.runIncremental(spark, outInc, e2).collect()
    assert(rep.map(_.getString(0)).toSet === PipelineRun.Stages.toSet)
    assert(rep.forall(_.getAs[Int]("attempts") === 1))

    // untouched silver partitions were not rewritten (same files, same
    // mtimes); touched ones were
    val after = partFiles(s"$outInc/silver")
    val (beforeTouched, beforeUntouched) = before.partition {
      case (f, _) => affected.exists(d => f.startsWith(s"_trade_date=$d/"))
    }
    assert(beforeUntouched.nonEmpty)
    beforeUntouched.foreach { case (f, mtime) =>
      assert(after.get(f).contains(mtime), s"untouched partition file $f rewritten")
    }
    assert(beforeTouched.keySet.forall(f =>
      !after.contains(f) || after(f) != beforeTouched(f)),
      "touched partitions must have been rewritten")

    // every table identical to the full rebuild
    def assertTablesEqual(): Unit =
      for (t <- Seq("bronze", "silver", "ohlcv_1m", "ohlcv_1h",
        "daily_metrics", "price_latest")) {
        val a = spark.read.parquet(s"$outFull/$t")
        val b = spark.read.parquet(s"$outInc/$t")
        val cols = a.columns.sorted.toSeq
        assert(b.columns.sorted.toSeq === cols, s"$t columns")
        val av = a.select(cols.map(col): _*).orderBy(cols.map(col): _*)
          .collect().map(_.toSeq).toSeq
        val bv = b.select(cols.map(col): _*).orderBy(cols.map(col): _*)
          .collect().map(_.toSeq).toSeq
        assert(av === bv, s"$t contents must match the full rebuild")
      }
    assertTablesEqual()

    // watermark advanced to the new global max ingest
    assert(PipelineRun.readWatermark(outInc).get.isAfter(wm1))

    // idempotency: re-running with an EMPTY batch re-merges only the
    // lookback overlap and changes nothing
    PipelineRun.runIncremental(spark, outInc, e2.limit(0))
    assertTablesEqual()
  }

  test("retry: transient failures re-run the body; exhaustion propagates") {
    // fails twice, then succeeds — the Airflow default_args analog
    var calls = 0
    val got = Retry.withRetries(2, 0L, "flaky") {
      calls += 1
      if (calls < 3) throw new RuntimeException(s"transient $calls")
      42
    }
    assert(got === 42 && calls === 3)
    // exhausted retries: the LAST failure propagates, priors suppressed
    var calls2 = 0
    val e = intercept[RuntimeException] {
      Retry.withRetries(1, 0L, "doomed") {
        calls2 += 1
        throw new RuntimeException(s"boom $calls2")
      }
    }
    assert(calls2 === 2 && e.getMessage === "boom 2")
    assert(e.getSuppressed.map(_.getMessage).toSeq === Seq("boom 1"))
    // zero retries = single attempt
    var calls3 = 0
    intercept[RuntimeException] {
      Retry.withRetries(0, 0L, "once") { calls3 += 1; throw new RuntimeException("x") }
    }
    assert(calls3 === 1)
  }

  test("stg filters non-positive sizes and buckets minutes") {
    assert(stg.filter(col("size") <= 0).count() === 0)
    val bad = stg.filter(
      expr("minute_bucket <> cast(date_trunc('minute', trade_time) as timestamp_ntz)"))
    assert(bad.count() === 0)
  }

  test("data quality: full pipeline report covers bronze/silver/freshness/gold") {
    val m1 = Ohlcv.ohlcv1m(stg)
    val h1 = Ohlcv.ohlcv1h(m1)
    val dm = DailyMetrics.daily(h1)
    val pl = PriceLatest.latest(stg, m1, h1, dm)
    val rep = DataQuality.fullReport(bronzeDup, silver, m1, h1, dm, pl)
    val uniq = rep.filter(col("check_name") === "unique_trade_id").head()
    assert(uniq.getAs[Long]("violations") === 0L)
    // 9 bronze + 12 silver + 1 freshness + 3 m1 + 3 h1 + 3 dm + 3 pl
    assert(rep.count() === 34)
    // the ordered-schema expectation holds on both layers
    val schemaRows = rep.filter(col("check_name") === "schema_ordered_columns")
    assert(schemaRows.count() === 2 && schemaRows.filter(!col("passed")).count() === 0)
    // gold grain uniqueness holds on every mart
    val grain = rep.filter(col("check_name").startsWith("unique_") &&
      col("table_name").isin("ohlcv_1m", "ohlcv_1h", "daily_metrics", "price_latest"))
    assert(grain.count() === 4 && grain.filter(!col("passed")).count() === 0)
    // freshness is anchored to data, so it always passes on a static set
    val fresh = rep.filter(col("check_name") === "freshness_products_24h").head()
    assert(fresh.getAs[Boolean]("passed"))
    // size=0 trades legitimately violate positive_size (silver filters
    // price only, as the reference does) — the report must surface that
    val failing = rep.filter(!col("passed"))
      .select("check_name").collect().map(_.getString(0)).toSet
    assert(failing.subsetOf(Set("positive_size")))
    val zeroSizes = silver.filter(col("size") <= 0).count()
    assert((zeroSizes > 0) === failing.contains("positive_size"))
  }

  test("schema check fires when the column order drifts") {
    val drifted = bronzeDup.select(
      DataQuality.BronzeColumns.reverse.map(col): _*)
    val rep = DataQuality.bronzeReport(drifted)
    val schemaRow = rep.filter(col("check_name") === "schema_ordered_columns").head()
    assert(schemaRow.getAs[Long]("violations") === 1L)
    assert(!schemaRow.getAs[Boolean]("passed"))
  }
}
