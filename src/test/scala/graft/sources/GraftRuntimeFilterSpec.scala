package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.functions.{col, sum}
import org.apache.spark.sql.graft.GraftV1Wrap

import graft.GraftSuite
import graft.operators.SnapshotTable

/** Runtime (dynamic) filtering through the connector — VERDICT r11 #2:
  * a selective dim side of an equi-join narrows the fact-side
  * `format("graft")` scan at planning time (key range + exact IN set),
  * so manifest pruning drops fact FILES the join could never match.
  * Plan-asserted: the narrowed predicate lands in the scan and the
  * kept-file count drops; answer-asserted: identical results with the
  * feature on and off, including the join types that must NOT prune. */
class GraftRuntimeFilterSpec extends GraftSuite {
  import spark.implicits._

  // fact: k clustered into 8 tight-range files (range-repartitioned),
  // per-file bounds recorded on k — the layout where a key-range
  // conjunct refutes whole files
  private lazy val factRoot: String = {
    val root = Files.createTempDirectory("graft-rtf-fact").toString + "/t"
    val df = (0 until 800).map(i => (i.toLong, s"p${i % 7}", i * 10.0))
      .toDF("k", "cat", "amount")
    df.repartitionByRange(8, col("k"))
      .write.format("graft").option("statsCols", "k")
      .mode("overwrite").save(root)
    root
  }

  private def fact: DataFrame = spark.read.format("graft").load(factRoot)

  private def factScan(df: DataFrame): Option[GraftScan] =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation
          if GraftV1Wrap.inner(r.scan).exists(
            _.asInstanceOf[GraftScan].root == factRoot) =>
        GraftV1Wrap.inner(r.scan).get.asInstanceOf[GraftScan]
    }

  private def candidateCount: Int =
    SnapshotTable.skippingKept(spark, factRoot, "true").size

  test("a selective dim prunes fact files; answers are pruning-invariant") {
    val dim = Seq(120L, 125L, 130L).toDF("dk")
    val q = fact.join(dim, col("k") === col("dk"))
      .agg(sum(col("amount")).as("total"))
    val expected = (120 + 125 + 130) * 10.0
    assert(q.head().getDouble(0) === expected)
    val scan = factScan(q).get
    assert(scan.runtimeFiltered)
    val p = scan.predicate.get
    assert(p.contains(">=") && p.contains("<=") && p.contains("IN"))
    // the files-read assertion: the derived conjunct refutes most of
    // the 8 tight-range files (keys 120-130 live in ONE)
    val kept = SnapshotTable.skippingKept(spark, factRoot, p).size
    assert(candidateCount >= 8 && kept * 4 <= candidateCount,
      s"kept $kept of $candidateCount")
    // identical answer with the feature off
    spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
    try {
      val off = fact.join(dim, col("k") === col("dk"))
        .agg(sum(col("amount")).as("total"))
      assert(factScan(off).exists(!_.runtimeFiltered))
      assert(off.head().getDouble(0) === expected)
    } finally spark.conf.unset("spark.graft.runtimeFilter.enabled")
  }

  test("composes with a static pushed filter; big dims fall back to range") {
    val dim = (100L until 140L).map(k => (k, "x")).toDF("dk", "pad")
    spark.conf.set("spark.graft.runtimeFilter.maxKeys", "10") // force range-only
    try {
      val q = fact.filter(col("amount") > 500.0)
        .join(dim, col("k") === col("dk"))
        .agg(sum(col("amount")).as("total"))
      val expected = (100 until 140).filter(_ * 10.0 > 500).map(_ * 10.0).sum
      assert(q.head().getDouble(0) === expected)
      val scan = factScan(q).get
      assert(scan.runtimeFiltered)
      // both the static conjunct and the runtime range are in the scan
      assert(scan.predicate.get.contains("amount") &&
        scan.predicate.get.contains(">="))
      assert(!scan.predicate.get.contains(" IN ")) // range-only past maxKeys
      assert(SnapshotTable.skippingKept(spark, factRoot,
        scan.predicate.get).size * 4 <= candidateCount)
    } finally spark.conf.unset("spark.graft.runtimeFilter.maxKeys")
  }

  test("join types that keep unmatched fact rows are never pruned") {
    val dim = Seq(120L).toDF("dk")
    // fact LEFT OUTER dim: every fact row survives — pruning the fact
    // side would be wrong, and the rule must know that
    val q = fact.join(dim, col("k") === col("dk"), "left_outer")
      .agg(sum(col("amount")).as("total"))
    assert(factScan(q).exists(!_.runtimeFiltered))
    assert(q.head().getDouble(0) === (0 until 800).map(_ * 10.0).sum)
    // dim LEFT OUTER fact: the fact is on the nullable side — prunable
    val q2 = dim.join(fact, col("dk") === col("k"), "left_outer")
      .agg(sum(col("amount")).as("total"))
    assert(factScan(q2).exists(_.runtimeFiltered))
    assert(q2.head().getDouble(0) === 1200.0)
    // left semi keeps matched fact rows only — prunable
    val q3 = fact.join(dim, col("k") === col("dk"), "left_semi")
      .agg(sum(col("amount")).as("total"))
    assert(factScan(q3).exists(_.runtimeFiltered))
    assert(q3.head().getDouble(0) === 1200.0)
  }

  test("non-deterministic or oversized NON-graft dims are left alone") {
    // NB: a threshold outside rand()'s [0,1) range would be constant-
    // folded away by the optimizer (leaving a deterministic dim), and
    // a LOCAL relation under a filter can fold to a deterministic
    // LocalRelation outright — so the dim must be FILE-backed (plain
    // parquet, not graft: no recorded bounds, neither tier can fire)
    // with a genuine non-deterministic filter above
    val pq = Files.createTempDirectory("graft-rtf-pq").toString + "/d"
    (0L until 800L).toDF("dk").write.parquet(pq)
    val rnd = spark.read.parquet(pq)
      .where(org.apache.spark.sql.functions.rand() < 0.9999999999)
    val q = fact.join(rnd, col("k") === col("dk"))
      .agg(sum(col("amount")).as("total"))
    assert(factScan(q).exists(!_.runtimeFiltered))
    spark.conf.set("spark.graft.runtimeFilter.maxBuildBytes", "1")
    try {
      val q2 = fact.join(Seq(120L).toDF("dk"), col("k") === col("dk"))
        .agg(sum(col("amount")).as("total"))
      assert(factScan(q2).exists(!_.runtimeFiltered))
    } finally spark.conf.unset("spark.graft.runtimeFilter.maxBuildBytes")
  }

  test("oversized GRAFT dims narrow from recorded bounds — no plan-time job") {
    // VERDICT r13 #4: a dim past maxBuildBytes used to get NOTHING;
    // when it is a graft scan, its bounds sidecars still yield the
    // [min,max] conjunct from driver metadata alone
    val dimRoot = Files.createTempDirectory("graft-rtf-bigdim")
      .toString + "/t"
    (700L until 740L).map(k => (k, s"n$k")).toDF("dk", "name")
      .repartitionByRange(2, col("dk"))
      .write.format("graft").option("statsCols", "dk")
      .mode("overwrite").save(dimRoot)
    val dim = spark.read.format("graft").load(dimRoot)
    spark.conf.set("spark.graft.runtimeFilter.maxBuildBytes", "1")
    try {
      val q = fact.join(dim, col("k") === col("dk"))
        .agg(sum(col("amount")).as("total"))
      val expected = (700 until 740).map(_ * 10.0).sum
      assert(q.head().getDouble(0) === expected)
      val scan = factScan(q).get
      assert(scan.runtimeFiltered)
      val p = scan.predicate.get
      // metadata tier: range only — never an IN set or bloom (those
      // need evaluated keys)
      assert(p.contains(">=") && p.contains("<=") && !p.contains(" IN "),
        p)
      assert(scan.runtimeBlooms.isEmpty)
      // the range refutes the low-key fact files
      assert(SnapshotTable.skippingKept(spark, factRoot, p).size * 4
        <= candidateCount)

      // a pushed dim predicate TIGHTENS the range: bounds fold over
      // the dim scan's kept files, not the whole dim table
      val q2 = fact.join(dim.filter(col("dk") >= 720L),
        col("k") === col("dk"))
        .agg(sum(col("amount")).as("total"))
      assert(q2.head().getDouble(0) === (720 until 740).map(_ * 10.0).sum)
      val p2 = factScan(q2).get.predicate.get
      assert(SnapshotTable.skippingKept(spark, factRoot, p2).size <=
        SnapshotTable.skippingKept(spark, factRoot, p).size, s"$p2 vs $p")

      // a NONDETERMINISTIC filter above a graft dim still narrows
      // (table bounds are a superset of any filtered domain)
      val q3 = fact.join(
        dim.where(org.apache.spark.sql.functions.rand() < 0.9999999999),
        col("k") === col("dk"))
        .agg(sum(col("amount")).as("total"))
      assert(factScan(q3).exists(_.runtimeFiltered))
      assert(q3.head().getDouble(0) === expected)
    } finally spark.conf.unset("spark.graft.runtimeFilter.maxBuildBytes")
  }

  test("a two-cluster dim domain prunes fact files BETWEEN the clusters (union of ranges)") {
    // VERDICT r14 #5: the metadata tier used to emit one [min,max]
    // envelope — a bimodal dim key domain (keys at both ends of the
    // fact's range) then pruned nothing. The union-of-ranges conjunct
    // (OR of the dim's merged per-file bound ranges) keeps only the
    // fact files overlapping a cluster.
    val dimRoot = Files.createTempDirectory("graft-rtf-bimodal")
      .toString + "/t"
    // two clusters at opposite ends: 0-39 and 760-799, one tight-range
    // file each (range repartition by dk)
    ((0L until 40L) ++ (760L until 800L)).map(k => (k, s"n$k"))
      .toDF("dk", "name").repartitionByRange(2, col("dk"))
      .write.format("graft").option("statsCols", "dk")
      .mode("overwrite").save(dimRoot)
    val dim = spark.read.format("graft").load(dimRoot)
    spark.conf.set("spark.graft.runtimeFilter.maxBuildBytes", "1")
    try { // force the METADATA tier
      val q = fact.join(dim, col("k") === col("dk"))
        .agg(sum(col("amount")).as("total"))
      val expected = ((0 until 40) ++ (760 until 800)).map(_ * 10.0).sum
      assert(q.head().getDouble(0) === expected)
      val scan = factScan(q).get
      assert(scan.runtimeFiltered)
      val p = scan.predicate.get
      assert(p.contains(" OR "), p) // the union, not one envelope
      // fact files strictly between the clusters (k 100..759 ranges)
      // are refuted — the envelope [0, 799] would have kept all 8
      val kept = SnapshotTable.skippingKept(spark, factRoot, p).size
      assert(kept * 2 <= candidateCount, s"kept $kept of $candidateCount")
      // answers identical with the feature off
      spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
      try {
        assert(fact.join(dim, col("k") === col("dk"))
          .agg(sum(col("amount")).as("total"))
          .head().getDouble(0) === expected)
      } finally spark.conf.unset("spark.graft.runtimeFilter.enabled")
    } finally spark.conf.unset("spark.graft.runtimeFilter.maxBuildBytes")
  }

  test("fires through GOVERNED-catalog SQL star joins too") {
    val cat = Files.createTempDirectory("graft-rtf-gov").toString + "/cat"
    spark.conf.set("spark.sql.catalog.rtfgov",
      "graft.sources.GraftGovernedCatalog")
    spark.conf.set("spark.sql.catalog.rtfgov.root", cat)
    try {
      graft.operators.Catalog.transact(cat, Seq(
        "fact" -> (0 until 800).map(i => (i.toLong, i * 10.0))
          .toDF("k", "amount").repartitionByRange(8, col("k")),
        "dim" -> Seq((120L, "one"), (125L, "two")).toDF("dk", "tag")))
      val q = spark.sql(
        "SELECT sum(f.amount) AS total FROM rtfgov.fact f " +
          "JOIN rtfgov.dim d ON f.k = d.dk")
      assert(q.head().getDouble(0) === (120 + 125) * 10.0)
      val scans = q.queryExecution.optimizedPlan.collect {
        case r: DataSourceV2ScanRelation =>
          GraftV1Wrap.inner(r.scan).get.asInstanceOf[GraftScan]
      }
      assert(scans.exists(s =>
        s.root.endsWith("/fact") && s.runtimeFiltered &&
          s.predicate.exists(_.contains("IN"))))
    } finally {
      spark.conf.unset("spark.sql.catalog.rtfgov")
      spark.conf.unset("spark.sql.catalog.rtfgov.root")
    }
  }

  test("an empty dim side stays correct (no conjunct, empty join)") {
    val dim = Seq.empty[Long].toDF("dk")
    val q = fact.join(dim, col("k") === col("dk")).select(col("amount"))
    assert(q.count() === 0)
  }

  // fact laid out by k % 8 — every file spans the whole key range, so
  // the [min,max] conjunct refutes NOTHING; only the bloom tiers can
  private lazy val modRoot: String = {
    val root = Files.createTempDirectory("graft-rtf-mod").toString + "/t"
    (0 until 800).map(i => (i.toLong, i * 10.0)).toDF("k", "amount")
      .repartition(8, org.apache.spark.sql.functions.pmod(col("k"), org.apache.spark.sql.functions.lit(8)))
      .write.format("graft")
      .option("statsCols", "k").option("bloomCols", "k")
      .mode("overwrite").save(root)
    root
  }

  private def modFact: DataFrame = spark.read.format("graft").load(modRoot)

  private def scanOutputRows(q: DataFrame): Long = {
    q.collect()
    def nodes(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.SparkPlan] =
      p.collect { case n => n }.flatMap {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          nodes(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          nodes(s.plan)
        case n => Seq(n)
      }
    nodes(q.queryExecution.executedPlan)
      .collect { case s: org.apache.spark.sql.execution.RowDataSourceScanExec =>
        s.metrics("numOutputRows").value }
      .min
  }

  test("past maxKeys a dim-key BLOOM still prunes files via sidecars") {
    // 300 keys ≡ 3 (mod 8): above the IN cap (200), disjoint from 7 of
    // the 8 residue files. Range is [3, 2395] — refutes no file on
    // this layout; the file-bloom probe drops ~7 of 8.
    val dim = (0 until 300).map(i => (8L * i + 3, s"d$i")).toDF("dk", "tag")
    val q = modFact.join(dim, col("k") === col("dk"))
      .agg(sum(col("amount")).as("total"))
    val expected = (0 until 800).filter(_ % 8 == 3).map(_ * 10.0).sum
    assert(q.head().getDouble(0) === expected)
    val scan = factScanAt(q, modRoot).get
    assert(scan.runtimeFiltered && scan.runtimeBlooms.nonEmpty)
    assert(!scan.predicate.get.contains(" IN ")) // past the IN cap
    val kept = SnapshotTable.bloomKeysKept(spark, modRoot, "k",
      scan.runtimeBlooms.head.fileProbes,
      SnapshotTable.skippingKept(spark, modRoot, scan.predicate.get))
    assert(kept.size <= 2, s"bloom kept ${kept.size} of 8 files")
    // answers identical with the feature off
    spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
    try assert(modFact.join(dim, col("k") === col("dk"))
      .agg(sum(col("amount")).as("total")).head().getDouble(0) === expected)
    finally spark.conf.unset("spark.graft.runtimeFilter.enabled")
  }

  test("a 10^4-key dim shrinks the fact exchange via the row residual") {
    // every even key 0..19998: interleaved with the fact domain, so
    // neither bounds nor file blooms can refute (every file holds
    // matches) — the ROW-level might-contain is what must shrink the
    // scan output (~400 matching + ~1% fp instead of all 800)
    val dim = (0 until 10000).map(i => (2L * i, s"d$i")).toDF("dk", "tag")
    val q = modFact.join(dim, col("k") === col("dk"))
      .agg(sum(col("amount")).as("total"))
    val expected = (0 until 800).filter(_ % 2 == 0).map(_ * 10.0).sum
    assert(q.head().getDouble(0) === expected)
    val scan = factScanAt(q, modRoot).get
    assert(scan.runtimeFiltered && scan.runtimeBlooms.nonEmpty)
    assert(scan.runtimeBlooms.head.keyCount === 10000L)
    val rows = scanOutputRows(
      modFact.join(dim, col("k") === col("dk")).select(col("amount")))
    assert(rows >= 400 && rows <= 500, s"scan emitted $rows of 800 rows")
    // identical answer with the feature off, and the full 800 emitted
    spark.conf.set("spark.graft.runtimeFilter.enabled", "false")
    try {
      val off = modFact.join(dim, col("k") === col("dk"))
        .select(col("amount"))
      assert(scanOutputRows(off) === 800L)
      assert(modFact.join(dim, col("k") === col("dk"))
        .agg(sum(col("amount")).as("total")).head().getDouble(0) === expected)
    } finally spark.conf.unset("spark.graft.runtimeFilter.enabled")
  }

  test("past bloomMaxKeys only the range conjunct pushes") {
    spark.conf.set("spark.graft.runtimeFilter.bloomMaxKeys", "100")
    try {
      val dim = (0 until 300).map(i => (8L * i + 3, s"d$i")).toDF("dk", "tag")
      val q = modFact.join(dim, col("k") === col("dk"))
        .agg(sum(col("amount")).as("total"))
      val expected = (0 until 800).filter(_ % 8 == 3).map(_ * 10.0).sum
      assert(q.head().getDouble(0) === expected)
      val scan = factScanAt(q, modRoot).get
      assert(scan.runtimeFiltered && scan.runtimeBlooms.isEmpty)
    } finally spark.conf.unset("spark.graft.runtimeFilter.bloomMaxKeys")
  }

  test("the dim-side aggregate runs once per plan (memoized domain)") {
    val dim = Seq(120L, 125L).toDF("dk")
    val q = fact.join(dim, col("k") === col("dk"))
      .agg(sum(col("amount")).as("total"))
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // force several re-optimizations of the same plan
    q.queryExecution.optimizedPlan
    val mid = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    GraftV1Wrap.ofRows(spark, q.queryExecution.logical)
      .queryExecution.optimizedPlan
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    // first optimization pays a bounded number of tiny dim-side jobs
    // (the bounds/count aggregate, then — count permitting — the
    // distinct key collection; each may split into sub-jobs)
    assert(mid - before <= 6, s"first optimization ran ${mid - before} jobs")
    assert(after === mid, "re-optimizing the same dim side re-ran its job")
  }

  private def factScanAt(df: DataFrame, root: String): Option[GraftScan] =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: DataSourceV2ScanRelation
          if GraftV1Wrap.inner(r.scan).exists(
            _.asInstanceOf[GraftScan].root == root) =>
        GraftV1Wrap.inner(r.scan).get.asInstanceOf[GraftScan]
    }
}
