package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-mixture planning — the "data mixing" step between curation
  * and training: given the curated corpus and a token budget, how many
  * tokens should each SOURCE contribute? Uses α-temperature sampling
  * (p_s ∝ n_s^α, the multilingual sampling rule of mBERT/XLM-R, α=0.5
  * here so the exponent is a single correctly-rounded `sqrt` — no
  * libm, same bits on every engine): upweights small sources without
  * letting giant ones dominate. Output per source: available tokens,
  * normalized mixture weight, the budget share, and `epochs` (share ÷
  * available — >1 means the source repeats, the oversampling signal).
  *
  * One groupBy(source) shuffle of narrow partial sums; the weight
  * normalizer is a 1-row broadcast whose sum folds in source order
  * (collect_list → array_sort → aggregate), the repo's standard
  * ordered-fold determinism discipline — sources are few by
  * definition, so the fold is metadata-sized. */
object Mixture {

  def plan(docs: DataFrame, budgetTokens: Long = 1000000L): DataFrame = {
    val per = docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum(ceil(col("n_chars").cast("double") / 4.0).cast("long"))
        .as("n_tokens"))
      .withColumn("sq", sqrt(col("n_tokens").cast("double")))
    val tot = per
      .agg(aggregate(
        array_sort(collect_list(struct(col("source"), col("sq")))),
        lit(0.0), (acc, x) => acc + x.getField("sq")).as("z"))
    val w = col("sq") / col("z")
    per.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        w.as("weight"),
        floor(lit(budgetTokens.toDouble) * w).cast("long")
          .as("target_tokens"),
        (lit(budgetTokens.toDouble) * w / col("n_tokens").cast("double"))
          .as("epochs"))
  }
}
