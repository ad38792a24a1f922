package graft

import org.apache.spark.sql.AnalysisException
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.BloomContains

/** Native bloom-probe expression: parity with mightContainString on
  * both codegen and interpreted paths, null semantics, foldability. */
class BloomContainsSpec extends GraftSuite {

  private def filterOf(items: Seq[String]): Array[Byte] = {
    val bf = BloomFilter.create(items.size.max(1), 0.01)
    items.foreach(bf.putString)
    BloomContains.serialize(bf)
  }

  test("graft_bloom_contains matches mightContainString on both eval paths") {
    BloomContains.register(spark)
    import spark.implicits._
    val members = (0 until 500).map(i => s"member_$i")
    val bytes = filterOf(members)
    val bf = BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
    val probes = (members.take(100) ++ (0 until 400).map(i => s"other_$i"))
    val df = probes.toDF("s")
    def run(): Map[String, Boolean] =
      df.select(col("s"), BloomContains.contains(lit(bytes), col("s")).as("hit"))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    val expect = probes.map(p => p -> bf.mightContainString(p)).toMap
    assert(run() === expect)
    // every true member must hit (no false negatives by construction)
    members.take(100).foreach(m => assert(expect(m)))
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(run() === expect)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null probe yields null; non-foldable filter argument is rejected") {
    BloomContains.register(spark)
    import spark.implicits._
    val bytes = filterOf(Seq("x"))
    val df = Seq(Some("x"), None).toDF("s")
    val rows = df.select(BloomContains.contains(lit(bytes), col("s")))
      .collect()
    assert(rows(0).getBoolean(0))
    assert(rows(1).isNullAt(0))
    // a per-row filter column would deserialize the sketch per row —
    // structurally rejected at analysis
    val bad = Seq(("x".getBytes, "x")).toDF("f", "s")
    intercept[AnalysisException] {
      bad.select(BloomContains.contains(col("f"), col("s"))).collect()
    }
  }

  test("graft_bloom_contains is callable from SQL via extensions name") {
    val s2 = spark.newSession()
    BloomContains.register(s2)
    val bytes = filterOf(Seq("needle"))
    import s2.implicits._
    val hit = Seq("needle").toDF("s")
      .selectExpr(s"graft_bloom_contains(X'${bytes.map("%02x".format(_)).mkString}', s) v")
      .head().getBoolean(0)
    assert(hit)
  }
}
