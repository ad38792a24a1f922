package graft

import org.apache.spark.sql.functions._

import graft.functions.DotProduct
import graft.sources.Tables

/** Native DotProduct expression: value parity with the declarative
  * fold, codegen path, and extensions registration. */
class DotProductSpec extends GraftSuite {

  test("graft_dot equals the higher-order-function fold bit-for-bit") {
    DotProduct.register(spark)
    val emb = Tables.embeddings(spark, sf).limit(200)
    val both = emb.crossJoin(
        Tables.embeddings(spark, sf).limit(50)
          .select(col("embedding").as("e2")))
      .select(
        DotProduct.dot(col("embedding"), col("e2")).as("native"),
        expr("aggregate(zip_with(embedding, e2, (x, y) -> cast(x as double) * cast(y as double)), " +
          "0D, (acc, v) -> acc + v)").as("hof"))
    // exact double equality, not tolerance: same fold order required
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    assert(both.count() === 200L * 50L)
  }

  test("graft_dot survives whole-stage codegen and interpreted eval") {
    DotProduct.register(spark)
    import spark.implicits._
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    assert(df.select(DotProduct.dot(col("a"), col("b"))).head().getDouble(0) === 32.0)
    // interpreted path (codegen off) must agree
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try
      assert(df.select(DotProduct.dot(col("a"), col("b"))).head().getDouble(0) === 32.0)
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("graft_dot is callable from SQL in an isolated session") {
    val s2 = spark.newSession()
    DotProduct.register(s2)
    val r = s2.sql("SELECT graft_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) v")
      .head().getDouble(0)
    assert(r === 11.0)
  }
}
