package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{col, lit, round}
import org.apache.spark.sql.types.DecimalType

/** Cross-engine deterministic rounding for double→DECIMAL ratio columns.
  *
  * Spark's double→decimal cast rounds the double's EXACT decimal
  * expansion HALF_UP; DuckDB's `round(x, s)` computes
  * `std::round(x·10^s)/10^s` in doubles. Near a decimal tie the two can
  * disagree (the ·10^s product may fall on the other side of the tie:
  * observed on vwap values like 141.272265625 whose ·1e8 product is
  * ...2.499998). `roundScaled` replicates DuckDB's algorithm step for
  * step — multiply, round-half-away-from-zero, divide are each IEEE
  * operations with identical results in both engines — so a subsequent
  * decimal cast lands on the same value everywhere. The oracle SQL
  * wraps the same expressions in `round(x, s)`.
  */
object Rounding {

  private val pow10 = (0 to 8).map(i => math.pow(10, i))

  /** DuckDB-equivalent round-half-away at `scale` digits. */
  def roundScaled(c: Column, scale: Int): Column = {
    val f = pow10(scale)
    round(c * lit(f)) / lit(f)
  }

  /** Cast every DECIMAL column to DOUBLE for the driver contract.
    *
    * Operators keep exact decimal arithmetic internally (order-independent
    * money sums), but the verification boundary emits float64: readers on
    * the two sides of the oracle compare materialize decimals differently
    * (parquet decimal128 → `Decimal('2.50000000')` objects vs DuckDB
    * result-set decimals → float64), so identical values canonicalize to
    * different hashes. A final exact-decimal→double cast is deterministic
    * and identical in both engines for our magnitudes (unscaled values
    * ≪ 2^53), which makes the hash representation-independent. The
    * matching oracle SQL applies `CAST(… AS DOUBLE)` to the same columns.
    */
  def asDoubles(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast("double").as(f.name)
        case _              => col(f.name)
      }
    }
    df.select(cols.toSeq: _*)
  }
}
