package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Embedding similarity: near-dup pairs and ANN top-k over the
  * `embeddings` table (Array[Float] column).
  *
  * Cosine is computed with codegen'd higher-order functions
  * (`zip_with` + `aggregate`) in strict ascending element order, so the
  * IEEE double result is bit-identical to the DuckDB oracle's
  * `list_reduce` fold (both folds start from 0.0).
  *
  * Scale paths:
  *  - near-dup: 32-plane random-hyperplane LSH signatures (built in the
  *    projection, no shuffle, persisted), 4×8-bit bands → bucket join →
  *    exact cosine verify. Candidate work is O(Σ bucket²), never n².
  *  - top-k: the correctness baseline broadcasts the (small) query set
  *    against the full corpus — a single scan with a per-query bounded
  *    heap via window rank; the LSH-bucketed variant restricts each
  *    query to its candidate buckets first (recall < 1, throughput ≫).
  */
object Similarity {

  import graft.functions.DotProduct

  private def ensureRegistered(df: DataFrame): Unit = {
    val spark = df.sparkSession
    if (!spark.sessionState.functionRegistry
        .functionExists(org.apache.spark.sql.catalyst.FunctionIdentifier(DotProduct.name)))
      DotProduct.register(spark)
  }

  /** vec_id, embedding, nrm — norm via the native codegen'd dot
    * product (graft.functions.DotProduct), bit-identical to the
    * declarative fold. */
  def withNorms(emb: DataFrame): DataFrame = {
    ensureRegistered(emb)
    emb.withColumn("nrm",
      sqrt(DotProduct.dot(col("embedding"), col("embedding"))))
  }

  private def cosine(prefixA: String, prefixB: String): Column =
    DotProduct.dot(col(s"${prefixA}_embedding"), col(s"${prefixB}_embedding")) /
      (col(s"${prefixA}_nrm") * col(s"${prefixB}_nrm"))

  /** Random-hyperplane LSH signature bits + band values per vector.
    * The signature stage is persisted before banding so the band
    * generator captures a cached attribute, not the 16×64-op signature
    * expression (projection collapse would re-run it per band and per
    * self-join side). */
  def lshBands(emb: DataFrame): DataFrame = {
    val sign = Hashing.planeSignSpark("i", "j")
    val sig =
      s"transform(sequence(0, ${Hashing.NumPlanes - 1}), i -> " +
        s"if(aggregate(sequence(0, ${Hashing.EmbDim - 1}), 0D, (acc, j) -> " +
        s"acc + $sign * cast(element_at(embedding, j + 1) as double)) > 0D, 1L, 0L))"
    val bb = Hashing.PlaneBandBits
    emb
      .withColumn("sig", expr(sig))
      .persist()
      .select(col("*"),
        expr(s"inline(transform(sequence(0, ${Hashing.PlaneBands - 1}), k -> " +
          s"struct(k as band, aggregate(sequence(0, ${bb - 1}), 0L, (a, m) -> " +
          s"a + shiftleft(element_at(sig, k * $bb + m + 1), m)) as bval)))"))
  }

  /** Embedding near-dup pairs: LSH-band candidates, exact cosine ≥
    * `threshold` verify. */
  def nearDupPairs(emb: DataFrame, threshold: Double = 0.4): DataFrame = {
    val banded = lshBands(withNorms(emb))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("band"), col("bval"))
    val a = banded.select(col("vec_id").as("vec_a"),
      col("embedding").as("a_embedding"), col("nrm").as("a_nrm"),
      col("band"), col("bval"))
    val b = banded.select(col("vec_id").as("vec_b"),
      col("embedding").as("b_embedding"), col("nrm").as("b_nrm"),
      col("band"), col("bval"))
    a.join(b, Seq("band", "bval"))
      .filter(col("vec_a") < col("vec_b"))
      .dropDuplicates("vec_a", "vec_b")
      .withColumn("cosine", cosine("a", "b"))
      .filter(col("cosine") >= threshold)
      .select("vec_a", "vec_b", "cosine")
  }

  /** Brute-force cosine top-k for a fixed query set (vec_id < nQueries),
    * queries broadcast — the exact-correctness path. */
  def annTopK(emb: DataFrame, nQueries: Int = 10, k: Int = 10): DataFrame = {
    val n = withNorms(emb).persist()
    val q = n.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("nrm").as("q_nrm"))
    val c = n.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_embedding"), col("nrm").as("c_nrm"))
    c.crossJoin(broadcast(q))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine", cosine("q", "c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** LSH-bucketed ANN (the 100 TB path): candidates limited to vectors
    * sharing ≥ 1 signature band with the query; same ranking semantics,
    * recall < 1 by construction — but fully deterministic (fixed
    * hyperplanes), so the DuckDB oracle mirrors the bucketing exactly
    * and this path is oracle-checked like the brute-force one. */
  def annTopKBucketed(emb: DataFrame, nQueries: Int = 10, k: Int = 10): DataFrame = {
    val banded = lshBands(withNorms(emb))
      .select(col("vec_id"), col("embedding"), col("nrm"), col("band"), col("bval"))
    val q = banded.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        col("embedding").as("q_embedding"), col("nrm").as("q_nrm"),
        col("band"), col("bval"))
    val c = banded.select(col("vec_id").as("neighbor_id"),
      col("embedding").as("c_embedding"), col("nrm").as("c_nrm"),
      col("band"), col("bval"))
    c.join(broadcast(q), Seq("band", "bval"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine", cosine("q", "c"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
