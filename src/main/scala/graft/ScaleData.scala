package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress data generator: replicate a testdata directory N×
  * with RE-KEYED ids — fact/event/document keys shift per copy so the
  * result is a ~N× corpus with the same per-copy structure (dimension
  * tables copy once; foreign keys into them stay valid). Used by the
  * round-11 scale bench: run `graft.Bench` with
  * `SPARK_GRAFT_SF_DIR=<out>` on the 15 most expensive keys and
  * compare against the sf0.1 run — wall time must grow ≤~linearly and
  * plan shapes must hold.
  *
  *   runMain graft.ScaleData <srcDir> <outDir> [copies=10]
  *
  * Deliberately NOT content-mutating: exact-dup groups grow N-way
  * (realistic for `dedup_exact`); the quadratic-by-workload near-dup
  * keys (ngram/minhash) are excluded from the scale list instead —
  * N-plicating every document multiplies their CANDIDATE PAIRS by N²
  * by construction, which measures the workload change, not the
  * engine. */
object ScaleData {

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--novel")) return novelMain(args.drop(1))
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    replicate(spark, src, out, copies)
    spark.stop()
  }

  /** Shift-keys per table: (key column, additional columns to shift by
    * the SAME stride — lineitem's orderkey must track orders'). */
  private val FactKeys: Map[String, Seq[String]] = Map(
    "orders" -> Seq("o_orderkey"),
    "lineitem" -> Seq("l_orderkey"),
    "events" -> Seq("event_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"))

  def replicate(spark: SparkSession, src: String, out: String,
                copies: Int): Unit = {
    val dims = Seq("region", "nation", "customer", "supplier", "part")
    dims.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode("overwrite").parquet(s"$out/$t.parquet")
    }
    // one stride across orders+lineitem so the FK keeps joining
    val orderStride = spark.read.parquet(s"$src/orders.parquet")
      .agg(max("o_orderkey")).head.getLong(0) + 1L
    FactKeys.foreach { case (t, keys) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      val stride = t match {
        case "orders" | "lineitem" => orderStride
        case _ => df.agg(max(col(keys.head))).head.getLong(0) + 1L
      }
      val copiesDf: DataFrame = (0 until copies).map { i =>
        keys.foldLeft(df)((d, k) =>
          d.withColumn(k, col(k) + lit(i.toLong * stride)))
      }.reduce(_ unionByName _)
      copiesDf.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaledata] $t x$copies (stride $stride)")
    }
  }

  // ───────────── novel near-dup corpora (VERDICT r11 #7) ─────────────
  //
  // The plain replicate() N-plicates every document, which multiplies
  // near-dup CANDIDATE PAIRS by N² by construction — a workload
  // change, not an engine property — so the round-11 scale bench had
  // to exclude the near-dup family. This mode instead synthesizes a
  // corpus of NOVEL documents with the source generator's shape
  // (per-language vocabulary, empirical (lang, length) distribution)
  // and a CONSTANT near-dup rate: every 7th document is a one-word
  // mutation of its predecessor (shingle Jaccard ≈ 0.88 — inside the
  // detectors' 0.8 band). Each copy writes under its OWN vocabulary
  // (copy c suffixes every word with c), so cross-copy documents share
  // zero shingles and near-identical-frequency simhash collisions stay
  // within a copy: near-dup candidate pairs grow LINEARLY with N by
  // construction, and the 1×-vs-10× ratio measures the LSH/banding
  // paths, not a saturating-vocabulary workload (a FIXED vocabulary
  // would make shingle document-frequency — and so candidate pairs —
  // grow quadratically, the same workload artifact that excluded the
  // family from the replicate() bench). Copy 0 is verbatim the source
  // generator's shape, so the 1× run is the real sf corpus workload.
  // `part` gets the same treatment for fuzzy_join: per-copy name
  // vocabularies, every 11th name a one-char edit of its predecessor.
  // Deterministic: every value is a pure function of the row id.

  private def novelMain(args: Array[String]): Unit = {
    val src = args(0)
    val out = args(1)
    val copies = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    novel(spark, src, out, copies)
    spark.stop()
  }

  def novel(spark: SparkSession, src: String, out: String,
            copies: Int): Unit = {
    import spark.implicits._
    // local so the generation closures stay self-contained (an object
    // method reference would drag the non-serializable singleton in)
    def rng(id: Long): scala.util.Random =
      new scala.util.Random(java.lang.Long.rotateLeft(
        (id + 1) * 0x9E3779B97F4A7C15L, 31))

    // documents: per-language vocabulary + empirical (lang, length)
    val docs = spark.read.parquet(s"$src/documents.parquet")
      .select("lang", "text").as[(String, String)].collect()
    val vocab: Map[String, Array[String]] = docs.groupBy(_._1)
      .map { case (l, ds) =>
        l -> ds.flatMap(_._2.split("\\s+")).distinct.sorted
      }
    val shapes: Array[(String, Int)] =
      docs.map { case (l, t) => (l, t.split("\\s+").length) }
    val nDocs = docs.length.toLong * copies
    val vocabB = spark.sparkContext.broadcast(vocab)
    val shapesB = spark.sparkContext.broadcast(shapes)

    val srcDocs = docs.length.toLong
    def docWords(id: Long): (String, Array[String]) = {
      val r = rng(id)
      val (lang, len) = shapesB.value(r.nextInt(shapesB.value.length))
      val words = vocabB.value(lang)
      (lang, Array.fill(len)(words(r.nextInt(words.length))))
    }
    spark.range(nDocs).map { id =>
      val (lang, base) = docWords(id)
      val words =
        if (id % 7 == 1) { // constant near-dup rate: ONE word swapped
          val (plang, prev) = docWords(id - 1)
          val r = rng(-id)
          val w = prev.clone()
          val v = vocabB.value(plang)
          w(r.nextInt(w.length)) = v(r.nextInt(v.length))
          w
        } else base
      // copy c writes under its own vocabulary: cross-copy docs share
      // zero shingles, so pair growth is linear by construction
      val copy = id / srcDocs
      val text =
        (if (copy == 0) words else words.map(w => s"$w$copy"))
          .mkString(" ")
      (id, text, lang, s"src${id % 20}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$out/documents.parquet")
    println(s"[scaledata] documents NOVEL x$copies ($nDocs rows)")

    // part: novel names over the source's name vocabulary; every 11th
    // a one-char edit of its predecessor (inside fuzzy_join's band)
    val parts = spark.read.parquet(s"$src/part.parquet")
    val nameWords: Array[Array[String]] = {
      val split = parts.select("p_name").as[String].collect()
        .map(_.split(" "))
      val width = split.map(_.length).max
      (0 until width).map(i =>
        split.filter(_.length > i).map(_(i)).distinct.sorted).toArray
    }
    val attrs = parts.select("p_brand", "p_type", "p_size", "p_retailprice")
      .as[(String, String, Int, Double)].collect()
    val srcParts = parts.count()
    val nParts = srcParts * copies
    val nameB = spark.sparkContext.broadcast(nameWords)
    val attrB = spark.sparkContext.broadcast(attrs)
    def partName(id: Long): String = {
      val r = rng(0x5EEDL ^ id)
      val copy = id / srcParts
      nameB.value.map { ws =>
        val w = ws(r.nextInt(ws.length))
        // a 3-letter per-(word, copy) HASH prefix: a 1-char suffix
        // would sit inside fuzzy_join's maxDist=2 band (quadratic
        // cross-copy matches), and a prefix CONSTANT within a copy
        // would give every word the same leading q-grams (document
        // frequency blowup in the q-gram index). Hashed per word, two
        // copies' spellings of one base word differ in ~3 chars and
        // no q-gram is shared copy-wide.
        if (copy == 0) w
        else {
          val pr = rng(w.hashCode.toLong ^ (copy * 0x517CC1B7L))
          val pfx = Array.fill(3)(('a' + pr.nextInt(26)).toChar).mkString
          s"$pfx$w"
        }
      }.mkString(" ")
    }
    spark.range(nParts).map { id =>
      val name =
        if (id % 11 == 1) { // one-char substitution: edit distance 1
          val prev = partName(id - 1).toCharArray
          val r = rng(-(0x5EEDL ^ id))
          var i = r.nextInt(prev.length)
          while (prev(i) == ' ') i = r.nextInt(prev.length)
          prev(i) = ('a' + r.nextInt(26)).toChar
          new String(prev)
        } else partName(id)
      val (brand, ptype, size, price) =
        attrB.value(rng(0xA77L ^ id).nextInt(attrB.value.length))
      (id, name, brand, ptype, size, price)
    }.toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice")
      .write.mode("overwrite").parquet(s"$out/part.parquet")
    println(s"[scaledata] part NOVEL x$copies ($nParts rows)")
  }
}
