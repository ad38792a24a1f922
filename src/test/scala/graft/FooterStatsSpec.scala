package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.SnapshotTable

/** The footer-lift contract (VERDICT r10 #1): a commit records
  * `__rows` + min/max stats and validates CHECK constraints from the
  * parquet FOOTERS its write just produced — it re-reads a written
  * file's DATA at most once, and on the common path not at all.
  * `SnapshotTable.commitDataScans` counts the fallback scans. */
class FooterStatsSpec extends GraftSuite {
  import spark.implicits._

  private def mixed: DataFrame =
    Seq(
      (1L, "alpha", BigDecimal("10.50000000"), "2024-01-01 10:00:00", "d1"),
      (2L, "bravo", BigDecimal("0.12345678"), "2024-01-02 09:30:00", "d1"),
      (3L, "÷wide", BigDecimal("99999.00000001"), "2024-02-01 00:00:00", "d2"),
      (4L, null, null, null, "d2"))
      .toDF("n", "s", "price", "tss", "day")
      .withColumn("price", col("price").cast("decimal(18,8)"))
      .withColumn("ts", col("tss").cast("timestamp"))
      .withColumn("dt", col("tss").cast("date"))
      .drop("tss")

  /** The scan-derived truth the footer lift must reproduce. */
  private def scanStats(root: String, v: Long, cols: Seq[String]) = {
    val df = spark.read.parquet(s"$root/v=$v")
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(c =>
      Seq(min(col(c)).as(s"${c}__min"), max(col(c)).as(s"${c}__max")))
    df.groupBy(input_file_name().as("_file"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("_file", regexp_extract(col("_file"), "(v=\\d+/.*)$", 1))
  }

  test("a commit with stats columns reads no data after the write; sidecar equals the scan truth") {
    val root = Files.createTempDirectory("graft-fstats").toString
    val cols = Seq("n", "s", "price", "ts", "dt")
    val before = SnapshotTable.commitDataScans.get()
    SnapshotTable.commitAppend(mixed, root, "day", statsCols = cols)
    assert(SnapshotTable.commitDataScans.get() === before,
      "footer-liftable commit paid a data re-read")
    // the footer-lifted sidecar is value-identical to a scan recompute
    val lifted = SnapshotTable.fileStats(spark, root, 0L).get
    val truth = scanStats(root, 0L, cols)
    assert(lifted.columns.sorted.toSeq === truth.columns.sorted.toSeq)
    val l = lifted.orderBy("_file").collect().map(_.toSeq).toSeq
    val t = truth.select(lifted.columns.map(col).toIndexedSeq: _*)
      .orderBy("_file").collect().map(_.toSeq).toSeq
    assert(l === t)
    // and the consumers work off it: metadata count + skipping prune
    assert(SnapshotTable.fastCount(spark, root) === 4L)
    val skip = SnapshotTable.readSkipping(spark, root, "n >= 3")
    assert(skip.collect().map(_.getAs[Long]("n")).sorted.toSeq === Seq(3L, 4L))
  }

  test("bounds-provable CHECK constraints validate from footers (zero scans); violations still refuse") {
    val root = Files.createTempDirectory("graft-fstats-chk").toString
    SnapshotTable.commitAppend(
      Seq((1L, "d1"), (2L, "d1")).toDF("n", "day"), root, "day")
    SnapshotTable.addConstraint(spark, root, "pos", "n > 0")
    val before = SnapshotTable.commitDataScans.get()
    SnapshotTable.commitAppend(
      Seq((5L, "d2"), (9L, "d2")).toDF("n", "day"), root, "day")
    assert(SnapshotTable.commitDataScans.get() === before,
      "bounds-provable constraint paid a validation scan")
    // a violating batch refuses (the proof fails, the scan confirms)
    val e = intercept[IllegalStateException] {
      SnapshotTable.commitAppend(
        Seq((-1L, "d3"), (7L, "d3")).toDF("n", "day"), root, "day")
    }
    assert(e.getMessage.contains("pos"))
    assert(SnapshotTable.read(spark, root).count() === 4)
  }

  test("unprovable constraint shapes fall back to exactly one validation scan") {
    val root = Files.createTempDirectory("graft-fstats-unp").toString
    SnapshotTable.commitAppend(
      Seq(("ab", "d1")).toDF("s", "day"), root, "day")
    SnapshotTable.addConstraint(spark, root, "short", "length(s) < 10")
    val before = SnapshotTable.commitDataScans.get()
    SnapshotTable.commitAppend(
      Seq(("xyz", "d2")).toDF("s", "day"), root, "day")
    assert(SnapshotTable.commitDataScans.get() === before + 1)
    intercept[IllegalStateException] {
      SnapshotTable.commitAppend(
        Seq(("waaaaaay too long", "d3")).toDF("s", "day"), root, "day")
    }
  }

  test("double/float stats lift from footers — no fallback scan (VERDICT r11 #3)") {
    val root = Files.createTempDirectory("graft-fstats-dbl").toString
    val df = Seq(
      (1L, 1.5d, 2.5f, "d1"), (2L, -3.25d, 0.125f, "d1"),
      (3L, 99.75d, -8.5f, "d2"), (4L, 0.5d, 4.75f, "d2"))
      .toDF("n", "price", "ratio", "day")
    val before = SnapshotTable.commitDataScans.get()
    SnapshotTable.commitAppend(df, root, "day",
      statsCols = Seq("price", "ratio"))
    assert(SnapshotTable.commitDataScans.get() === before,
      "NaN-free double/float stats paid a data re-read")
    val lifted = SnapshotTable.fileStats(spark, root, 0L).get
    val truth = scanStats(root, 0L, Seq("price", "ratio"))
    val l = lifted.orderBy("_file").collect().map(_.toSeq).toSeq
    val t = truth.select(lifted.columns.map(col).toIndexedSeq: _*)
      .orderBy("_file").collect().map(_.toSeq).toSeq
    assert(l === t)
    // the consumers: metadata-answered bounds + answer-invariant skip
    assert(SnapshotTable.fastBounds(spark, root, "price") ===
      Some((-3.25d, 99.75d)))
    val skip = SnapshotTable.readSkipping(spark, root, "price > 50.0")
    assert(skip.collect().map(_.getAs[Long]("n")).toSeq === Seq(3L))
  }

  test("a NaN poisons its chunk's footer stats: fallback fires, skipping stays sound") {
    val root = Files.createTempDirectory("graft-fstats-nan").toString
    // d1 holds the NaN (parquet-mr omits the poisoned chunk's stats —
    // the writer behavior the NaN-free certificate rests on); d2 is
    // clean and must still refute
    val df = Seq(
      (1L, Double.NaN, "d1"), (2L, 1.0d, "d1"),
      (3L, 2.0d, "d2"), (4L, 3.0d, "d2"))
      .toDF("n", "price", "day")
    val before = SnapshotTable.commitDataScans.get()
    SnapshotTable.commitAppend(df, root, "day", statsCols = Seq("price"))
    assert(SnapshotTable.commitDataScans.get() === before + 1,
      "the NaN chunk must force the conservative fallback scan")
    // Spark ranks NaN above everything: the NaN row must survive a
    // `> 100` filter, so the d1 file must be KEPT (its scan-computed
    // max is NaN, which never refutes) while clean d2 prunes
    val skip = SnapshotTable.readSkipping(spark, root, "price > 100.0")
    assert(skip.collect().map(_.getAs[Long]("n")).toSeq === Seq(1L))
    assert(!skip.inputFiles.exists(_.contains("day=d2")))
    // and fastBounds refuses: a recorded NaN bound cannot answer max()
    assert(SnapshotTable.fastBounds(spark, root, "price").isEmpty ||
      SnapshotTable.fastBounds(spark, root, "price").get._2.asInstanceOf[Double].isNaN)
  }

  test("driver and distributed footer lifts are value-identical; the threshold wires into commits") {
    val root = Files.createTempDirectory("graft-fstats-dist").toString
    val cols = Seq("n", "s", "price", "ts", "dt")
    val before = SnapshotTable.commitDataScans.get()
    spark.conf.set("spark.graft.footerStats.distributedThreshold", "1")
    try {
      // the COMMIT itself lifts through the executor job
      SnapshotTable.commitAppend(mixed, root, "day", statsCols = cols)
      assert(SnapshotTable.commitDataScans.get() === before)
      val distributed = graft.operators.FooterStats.collect(spark,
        root, s"$root/v=0", cols)
      spark.conf.unset("spark.graft.footerStats.distributedThreshold")
      val driver = graft.operators.FooterStats.collect(spark,
        root, s"$root/v=0", cols)
      assert(distributed === driver)
      assert(driver === graft.operators.FooterStats.collectLocal(
        root, s"$root/v=0", cols,
        spark.sparkContext.hadoopConfiguration))
      // sidecar written through the distributed path equals scan truth
      val lifted = SnapshotTable.fileStats(spark, root, 0L).get
      val truth = scanStats(root, 0L, cols)
      val l = lifted.orderBy("_file").collect().map(_.toSeq).toSeq
      val t = truth.select(lifted.columns.map(col).toIndexedSeq: _*)
        .orderBy("_file").collect().map(_.toSeq).toSeq
      assert(l === t)
    } finally
      spark.conf.unset("spark.graft.footerStats.distributedThreshold")
  }

  test("footer-unusable columns (INT96 timestamps) fall back to one pruned scan, same sidecar values") {
    val root = Files.createTempDirectory("graft-fstats-96").toString
    val prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    try {
      spark.conf.set("spark.sql.parquet.outputTimestampType", "INT96")
      val before = SnapshotTable.commitDataScans.get()
      SnapshotTable.commitAppend(mixed, root, "day",
        statsCols = Seq("n", "ts"))
      assert(SnapshotTable.commitDataScans.get() === before + 1)
      val lifted = SnapshotTable.fileStats(spark, root, 0L).get
      val truth = scanStats(root, 0L, Seq("n", "ts"))
      val l = lifted.orderBy("_file").collect().map(_.toSeq).toSeq
      val t = truth.select(lifted.columns.map(col).toIndexedSeq: _*)
        .orderBy("_file").collect().map(_.toSeq).toSeq
      assert(l === t)
    } finally
      spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
  }
}
