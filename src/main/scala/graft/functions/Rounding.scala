package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, round}

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
}
