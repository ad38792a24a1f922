package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed FUZZY (edit-distance) join — the entity-resolution /
  * data-cleaning operator (matching near-identical names, symbols,
  * titles across feeds) WITHOUT the all-pairs cross join a naive
  * `levenshtein(a,b) <= d` theta join plans.
  *
  * Candidate generation is a q-gram inverted index (Gravano et al.,
  * approximate string joins): a pair within `maxDist` edits whose
  * longer string has ≥ q·(1+maxDist) characters must share at least
  * one q-gram (each edit destroys at most q of the longer side's
  * max(|a|,|b|)−q+1 grams, so shared ≥ max+1−q−d·q ≥ 1), making an
  * equi-join on grams a COMPLETE prefilter there; pairs short enough
  * to evade the bound live in one bounded "short strings" bucket
  * (both sides ≤ q·(1+maxDist)−1 chars — for q=3, d=2 that is ≤ 8
  * chars, a tiny relation at any corpus size). A length-difference
  * ≤ maxDist filter prunes candidates before the exact
  * `levenshtein` verify, which runs on candidates only.
  *
  * Scale shape: work is O(Σ per-gram pair counts) like the shingle
  * dedup family — never |L|·|R|; values are DEDUPLICATED before the
  * quadratic stage (match distinct values, join rows back by
  * equality), the classic entity-resolution layout. A hot gram (a
  * common substring) is an equi-join key, so AQE skew-split applies;
  * for pathological gram distributions cap gram df like
  * `Dedup.ngramJaccard` does.
  *
  * Caching: the deduplicated value sets are persisted (each feeds the
  * gram join AND the short bucket) and, as everywhere in the dedup
  * family, ownership passes to the caller — drop them with
  * `spark.catalog.clearCache()` between unrelated jobs. */
object FuzzyJoin {

  /** Distinct q-grams of a string column (strings shorter than q have
    * none — the short bucket covers them). */
  private def grams(c: String, q: Int): Column =
    expr(s"if(length($c) >= $q, array_distinct(transform(" +
      s"sequence(1, length($c) - $q + 1), i -> substring($c, i, $q)))" +
      ", array())")

  /** Matching VALUE pairs across two string columns: (a, b, dist)
    * with dist = levenshtein ≤ `maxDist`, over the DISTINCT non-null
    * values of each side. Join rows back on value equality. */
  def matches(left: DataFrame, lCol: String, right: DataFrame,
              rCol: String, maxDist: Int, q: Int = 3): DataFrame = {
    require(maxDist >= 0 && q >= 2, "need maxDist >= 0 and q >= 2")
    val l = left.select(col(lCol).cast("string").as("a"))
      .filter(col("a").isNotNull).distinct().persist()
    val r = right.select(col(rCol).cast("string").as("b"))
      .filter(col("b").isNotNull).distinct().persist()
    val lg = l.select(col("a"), explode(grams("a", q)).as("_g"))
    val rg = r.select(col("b"), explode(grams("b", q)).as("_g"))
    val byGram = lg.join(rg, "_g").select("a", "b")
    // the short bucket: pairs the gram bound cannot promise — both
    // sides under q(1+d) chars; bounded, broadcastable
    val cap = q * (1 + maxDist) - 1
    val shorts = l.filter(length(col("a")) <= cap)
      .crossJoin(r.filter(length(col("b")) <= cap))
      .select("a", "b")
    byGram.unionByName(shorts).distinct()
      .filter(abs(length(col("a")) - length(col("b"))) <= maxDist)
      .withColumn("dist", levenshtein(col("a"), col("b")))
      .filter(col("dist") <= maxDist)
  }

  /** Self fuzzy-join of one string column's distinct values: pairs
    * (a < b, dist ≤ maxDist) — the near-duplicate-values report that
    * feeds entity canonicalization (compose with [[Dedup.clusters]]
    * for transitive groups). */
  def selfPairs(df: DataFrame, strCol: String, maxDist: Int,
                q: Int = 3): DataFrame =
    matches(df, strCol, df, strCol, maxDist, q)
      .filter(col("a") < col("b"))
}
