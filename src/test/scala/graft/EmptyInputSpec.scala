package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators._

/** Degenerate inputs: every operator family must plan and run on empty
  * (and near-empty) inputs without div-zero, OOB, or ANSI errors. */
class EmptyInputSpec extends GraftSuite {
  import spark.implicits._

  private lazy val emptyDocs = spark.createDataFrame(
    spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
    StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("n_chars", LongType))))

  test("dedup and text ops on zero documents") {
    assert(Dedup.exact(emptyDocs).count() === 0)
    assert(Dedup.ngramJaccard(emptyDocs).count() === 0)
    assert(Dedup.minhashLsh(emptyDocs).count() === 0)
    assert(Dedup.simhash(emptyDocs).count() === 0)
    assert(TextAnalysis.quality(emptyDocs).count() === 0)
    assert(TextAnalysis.tokenCount(emptyDocs).count() === 0)
    assert(TextAnalysis.fingerprint(emptyDocs).count() === 0)
    assert(TextAnalysis.langId(spark, emptyDocs).count() === 0)
    assert(TextAnalysis.vocabTopK(emptyDocs).count() === 0)
    val emptyDocsFull = emptyDocs
      .withColumn("lang", lit(null).cast("string"))
      .withColumn("source", lit(null).cast("string"))
    assert(TextAnalysis.clean(emptyDocs).count() === 0)
    assert(TextAnalysis.repetition(emptyDocs).count() === 0)
    assert(TextAnalysis.docChunks(emptyDocs).count() === 0)
    assert(TextAnalysis.stratifiedSample(emptyDocsFull).count() === 0)
    val emptyEmb = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Similarity.ivfTopK(emptyEmb).count() === 0)
  }

  test("short/empty texts: no shingles, no OOB, quality still scores") {
    val d = Seq((0L, "", 0L), (1L, "one", 3L), (2L, "two words", 9L))
      .toDF("doc_id", "text", "n_chars")
    assert(Dedup.ngramJaccard(d).count() === 0) // nothing has 3 tokens
    assert(Dedup.minhashLsh(d).count() === 0)
    assert(TextAnalysis.quality(d).count() === 3)
    assert(TextAnalysis.fingerprint(d).count() === 3)
    // repetition: "" tokenizes to [""] (1 word), never div-zero
    assert(TextAnalysis.repetition(d).count() === 3)
    // chunking: every short doc yields exactly one whole-text chunk
    val ch = TextAnalysis.docChunks(d).collect()
    assert(ch.length === 3 && ch.forall(_.getLong(1) === 0L))
  }

  test("incremental read and z-order write on an empty table") {
    val dir = java.nio.file.Files.createTempDirectory("graft-empty").toString
    // a bronze with files but no usable watermark (all-NULL
    // ingested_at — the shape a fully-empty table's max() also takes):
    // max(ingested_at) is NULL — must yield an empty frame, not NPE on
    // the cutoff arithmetic
    Seq((1L, "2024-01-01")).toDF("trade_id", "d")
      .select(col("trade_id"),
        lit(null).cast("timestamp_ntz").as("ingested_at"),
        col("d").cast("date").as("_ingestion_date"))
      .write.partitionBy("_ingestion_date").parquet(s"$dir/bronze")
    assert(BronzeToSilver.incrementalReadPartitioned(spark, s"$dir/bronze")
      .count() === 0)
    // empty z-order input: degenerate min/max — writes as-is, no NPE
    val emptyNum = Seq((1.0d, 2.0d)).toDF("a", "b").limit(0)
    Layout.writeZOrdered(emptyNum, "a", "b", s"$dir/z")
    assert(spark.read.parquet(s"$dir/z").count() === 0)
    // all-NULL z-order columns: same guard path, rows preserved
    val nullNum = Seq((1L)).toDF("id")
      .withColumn("a", lit(null).cast("double"))
      .withColumn("b", lit(null).cast("double"))
    Layout.writeZOrdered(nullNum, "a", "b", s"$dir/znull")
    assert(spark.read.parquet(s"$dir/znull").count() === 1)
  }

  test("clusters converges past the soft maxIter bound on a long chain") {
    // a single 12-doc chain (diameter 11): with the old hard bound
    // maxIter=3 this returned partial labels (several components);
    // now it must run to convergence and report ONE cluster
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val labels = Dedup.clusters(chain, maxIter = 3)
    assert(labels.select("cluster_id").distinct().count() === 1)
    assert(labels.filter(col("is_canonical")).count() === 1)
    assert(labels.count() === 12)
  }

  test("round-6 operators on degenerate inputs") {
    val emptyDocsFull = emptyDocs.withColumn("source", lit(null).cast("string"))
    assert(TextAnalysis.bigramDocScore(emptyDocsFull).count() === 0)
    assert(TextAnalysis.curationReport(emptyDocsFull).count() === 0)
    // clusters on an empty pair set
    val emptyPairs = Seq((1L, 2L)).toDF("doc_a", "doc_b").limit(0)
    assert(Dedup.clusters(emptyPairs).count() === 0)
    // bucketed asof with an empty right side: all left rows, NULL picks
    val l = Seq((1L, "k", 100L)).toDF("id", "k", "ts")
    val r = Seq(("k", 1L, 1.0d)).toDF("k", "rts", "v").limit(0)
    val got = AsofJoin.asofBucketed(l, r, Seq("k"), "ts", "rts", Seq("v"))
      .collect()
    assert(got.length === 1 && got.head.isNullAt(got.head.fieldIndex("v")))
    // recall of an empty approximate result: zero hits, recall 0
    val ex = Seq((1L, 2L), (1L, 3L)).toDF("query_id", "neighbor_id")
    val rec = Similarity.annRecall(ex, ex.limit(0)).head()
    assert(rec.getAs[Long]("hits") === 0L &&
      rec.getAs[Double]("recall") === 0.0d)
  }

  test("round-9 TPC-H shapes and sketches on degenerate inputs") {
    import graft.sources.Tables
    val li = Tables.lineitem(spark, sf).limit(0)
    val (p, s, n, c, o, r) = (Tables.part(spark, sf),
      Tables.supplier(spark, sf), Tables.nation(spark, sf),
      Tables.customer(spark, sf), Tables.orders(spark, sf),
      Tables.region(spark, sf))
    assert(Analytics.q7VolumeShipping(s, n, c, o, li).count() === 0)
    assert(Analytics.q8MarketShare(r, n, c, s, o, li, p).count() === 0)
    assert(Analytics.q2MinCostSupplier(p, s, n, li).count() === 0)
    assert(Analytics.q11ImportantParts(s, n, li).count() === 0)
    assert(Analytics.q9ProductProfit(p, s, n, o, li).count() === 0)
    assert(Analytics.q12PriorityShipping(o, li).count() === 0)
    assert(Analytics.q20PotentialPromo(p, s, n, li).count() === 0)
    // sketches: zero docs → empty reports, no NPE on the null sketch
    val emptyDocsFull = emptyDocs
      .withColumn("lang", lit(null).cast("string"))
      .withColumn("source", lit(null).cast("string"))
    assert(Sketches.tokenHeavyHitters(emptyDocsFull).count() === 0)
    assert(Sketches.bloomDecontaminate(emptyDocsFull).count() === 0)
  }

  test("ohlcv on zero trades and merge with empty source") {
    val stg = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("trade_id", LongType), StructField("product_id", StringType),
        StructField("trade_time", TimestampNTZType),
        StructField("price", DecimalType(18, 8)),
        StructField("size", DecimalType(18, 8)),
        StructField("trade_value", DecimalType(18, 8)),
        StructField("minute_bucket", TimestampNTZType))))
    assert(Ohlcv.ohlcv1m(stg).count() === 0)
    assert(Ohlcv.ohlcv1h(Ohlcv.ohlcv1m(stg)).count() === 0)
    val m1 = Ohlcv.ohlcv1m(stg)
    assert(Ohlcv.rolling(m1).count() === 0)
    assert(Ohlcv.gapFill(m1).count() === 0)
    assert(Ohlcv.anomalyZscore(m1).count() === 0)
    assert(AsofJoin.asof(stg, Ohlcv.ohlcv1h(m1), Seq("product_id"),
      "trade_time", "window_end", Seq("vwap")).count() === 0)
    val t = Seq((1L, "x")).toDF("id", "v")
    val empty = t.limit(0)
    assert(MergeUpsert.merge(t, empty, "id").count() === 1)
    assert(MergeUpsert.merge(empty, t, "id").count() === 1)
  }
}
