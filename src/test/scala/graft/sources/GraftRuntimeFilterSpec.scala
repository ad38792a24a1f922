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

  test("non-deterministic or oversized dims are left alone") {
    // NB: a threshold outside rand()'s [0,1) range would be constant-
    // folded away by the optimizer (leaving a deterministic dim); this
    // one keeps essentially every row AND survives as a genuine
    // non-deterministic filter
    val rnd = fact.select(col("k").as("dk"))
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
}
