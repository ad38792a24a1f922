package graft

import org.apache.spark.sql.functions._

import graft.operators.{QualityClassifier, TextAnalysis}

/** Learned quality classifier: separates planted junk from real text,
  * produces calibrated-ish probabilities, and composes with the
  * deterministic holdout split. */
class QualityClassifierSpec extends GraftSuite {
  import spark.implicits._

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text", "lang", "source")

  // real docs + planted junk: repeated single words and one-char noise
  private def corpus = docs.limit(120).unionByName(
    (0 until 40).map { i =>
      (10000L + i, if (i % 2 == 0) Seq.fill(60)("spam").mkString(" ")
      else "x y " + Seq.fill(50)("z").mkString(" "))
    }.toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("junk")))

  test("the model separates planted junk from corpus text") {
    val model = QualityClassifier.train(corpus)
    val scored = QualityClassifier.score(corpus, model)
    assert(scored.count() === 160)
    // probabilities are probabilities
    assert(scored.filter(col("quality_prob") < 0 ||
      col("quality_prob") > 1).count() === 0)
    // planted junk scores below the real docs on average, by a margin
    val junkAvg = scored.filter(col("doc_id") >= 10000L)
      .agg(avg("quality_prob")).head.getDouble(0)
    val realAvg = scored.filter(col("doc_id") < 10000L)
      .agg(avg("quality_prob")).head.getDouble(0)
    assert(realAvg - junkAvg > 0.5,
      s"real=$realAvg junk=$junkAvg — no separation")
    // ...and the thresholded verdict gets the junk
    val junkKept = scored.filter(col("doc_id") >= 10000L &&
      col("quality_keep")).count()
    assert(junkKept <= 4, s"$junkKept junk docs kept")
  }

  test("holdout flow: train on the train split, score the test split") {
    val split = TextAnalysis.datasetSplit(corpus)
    val train = corpus.join(split.filter(col("split") === "train")
      .select("doc_id"), "doc_id")
    val test = corpus.join(split.filter(col("split") === "test")
      .select("doc_id"), "doc_id")
    val model = QualityClassifier.train(train)
    val scored = QualityClassifier.score(test, model)
    assert(scored.count() === test.count())
    // weak labels on the held-out slice mostly agree with the model
    val agree = scored
      .join(QualityClassifier.features(test).select("doc_id", "label"),
        "doc_id")
      .filter((col("label") === 1.0) === col("quality_keep")).count()
    assert(agree.toDouble / scored.count() >= 0.85)
  }
}
