package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout tools for shuffle avoidance at warehouse scale.
  *
  * Two techniques the 100 TB plan depends on:
  *
  *  - **Bucketing**: writing both sides of a recurring join bucketed
  *    (and sorted) by the join key lets Spark plan a co-located
  *    sort-merge join with NO exchange on either side — the shuffle is
  *    paid once at write time, amortized over every subsequent join.
  *
  *  - **Salting**: a skewed key (one product with 10⁹ trades) turns one
  *    reducer into the straggler. Salting spreads each hot key over
  *    `saltFactor` sub-keys; the small side is exploded to match. AQE's
  *    skew-join split handles moderate skew automatically — salting is
  *    the explicit tool for the extreme tail.
  */
object Layout {

  /** Write `df` bucketed+sorted by `key` into the session catalog as
    * `table` (parquet). Reads of `table` then join on `key` without a
    * shuffle against any table bucketed the same way. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.mode("overwrite")
      .format("parquet")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table) // managed table under spark.sql.warehouse.dir

  /** Co-located equi-join of two same-bucketed catalog tables. */
  def bucketedJoin(spark: SparkSession, leftTable: String,
                   rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)

  /** Z-order (Morton-curve) layout write — the multi-dimensional
    * data-skipping technique behind Delta's OPTIMIZE ZORDER: each of
    * the two numeric columns is min/max-normalized to 16 bits, their
    * bits interleaved into a curve value, and the data range-
    * partitioned + sorted by that value before writing. Every output
    * file then covers a small bounding box in BOTH dimensions, so
    * parquet min/max statistics skip files for range predicates on
    * EITHER column (a single-column sort only skips on that column).
    *
    * Scale: one range-partitioning shuffle (sampled bounds) at write
    * time, amortized over every subsequent selective read; the curve
    * expression is codegen'd bit arithmetic. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String,
                    path: String, numFiles: Int = 8): Unit =
    zOrdered(df, colA, colB, numFiles).write.mode("overwrite").parquet(path)

  /** The curve layout itself: `df` range-partitioned + sorted along the
    * Morton curve of (`colA`, `colB`) so each output partition (= file,
    * when written) covers a tight bounding box in BOTH dimensions.
    * Compose with [[SnapshotTable.commit]]`(zOrdered(...), root,
    * statsCols = Seq(colA, colB))` to persist those per-file boxes as
    * manifest column stats — [[SnapshotTable.readSkipping]] then prunes
    * files on range predicates over EITHER dimension. */
  def zOrdered(df: DataFrame, colA: String, colB: String,
               numFiles: Int = 8): DataFrame =
    mortonColumn(df, colA, colB) match {
      case None => df
      case Some(z) =>
        df.withColumn("_zorder", z)
          .repartitionByRange(numFiles, col("_zorder"))
          .sortWithinPartitions("_zorder")
          .drop("_zorder")
    }

  /** The Morton curve value of (`colA`, `colB`) normalized against
    * `df`'s own min/max (one tiny aggregate job) — the clustering key
    * [[zOrdered]] and the z-order write-order compaction share. None
    * when the input is empty or a dimension is all-NULL (a degenerate
    * table gains nothing from curve layout). */
  def mortonColumn(df: DataFrame, colA: String,
                   colB: String): Option[Column] = {
    val s = df.agg(
      min(col(colA).cast("double")), max(col(colA).cast("double")),
      min(col(colB).cast("double")), max(col(colB).cast("double"))).head()
    if (s.isNullAt(0) || s.isNullAt(2)) return None
    def norm(c: String, lo: Double, hi: Double): Column =
      least(lit(65535L), floor(
        (col(c).cast("double") - lit(lo)) /
          lit(math.max(hi - lo, java.lang.Double.MIN_NORMAL)) * 65536.0d)
        .cast("long"))
    val a = norm(colA, s.getDouble(0), s.getDouble(1))
    val b = norm(colB, s.getDouble(2), s.getDouble(3))
    Some((0 until 16).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i + 1))
    })
  }

  /** Salted inner equi-join: `big` is salted randomly-but-
    * deterministically (hash of a row-unique column), `small` is
    * exploded across all salt values. Semantics identical to
    * `big.join(small, key)`; the shuffle key becomes (key, salt). */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 uniqueCol: String, saltFactor: Int): DataFrame = {
    val salted = big.withColumn("_salt",
      pmod(hash(col(uniqueCol)), lit(saltFactor)))
    val exploded = small.withColumn("_salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(exploded, Seq(key, "_salt")).drop("_salt")
  }
}
