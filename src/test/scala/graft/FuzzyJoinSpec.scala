package graft

import org.apache.spark.sql.functions._

import graft.operators.FuzzyJoin

/** Fuzzy (edit-distance) join: the q-gram prefilter must be COMPLETE
  * — every pair the naive all-pairs levenshtein join finds, including
  * short strings the gram bound cannot promise — while doing
  * candidate-bounded work. */
class FuzzyJoinSpec extends GraftSuite {
  import spark.implicits._

  // deterministic mixed-length vocabulary: clusters of near-identical
  // strings, plus very short strings that evade the gram bound
  private def vocab: Seq[String] = {
    val bases = Seq("silver ingot", "copper coil", "steel beam",
      "glass pane", "ab", "abc", "x", "", "zq")
    bases ++ bases.map(_ + "s") ++ bases.map(b =>
      if (b.nonEmpty) b.updated(0, 'k') else "k") ++
      Seq("silvery ingot", "copper coils", "stel beam")
  }

  private def naive(maxDist: Int, voc: Seq[String] = vocab)
      : Set[(String, String, Int)] = {
    val n = voc.distinct
    (for {
      a <- n; b <- n if a < b
      d = {
        // classic Levenshtein, reference implementation
        val m = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
          if (i == 0) j else if (j == 0) i else 0
        }
        for (i <- 1 to a.length; j <- 1 to b.length)
          m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
            m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
        m(a.length)(b.length)
      }
      if d <= maxDist
    } yield (a, b, d)).toSet
  }

  test("selfPairs equals the naive all-pairs join at d=1 and d=2, shorts included") {
    val df = vocab.toDF("s")
    for (d <- Seq(1, 2)) {
      val got = FuzzyJoin.selfPairs(df, "s", d)
        .as[(String, String, Int)].collect().toSet
      assert(got === naive(d), s"maxDist=$d")
    }
  }

  test("hot shared grams stay complete under the Ed-Join prefix signature") {
    // every value shares one ubiquitous 30-char suffix — without the
    // rarest-first signature the gram join enumerates the full
    // quadratic through the suffix grams (the measured 100×-scale
    // blowup class); the signature picks the distinct prefix grams
    // instead, and completeness must hold for the planted near-dups
    val suffix = "commonsuffixsharedbyeveryvalue"
    val strs = (0 until 120).map(i => f"pfx$i%04d $suffix") ++
      Seq(s"pfx0000x $suffix",      // 1 edit from pfx0000 (insert x)
        s"pfx0001 ${suffix}y",      // 1 edit from pfx0001 (append y)
        s"qfx0002 $suffix")         // 1 edit from pfx0002 (swap char)
    // maxGramCandidates = 0 forces the signature path (the measured
    // gate would route this small corpus through the plain join)
    val got = FuzzyJoin.selfPairs(strs.toDF("s"), "s", 2,
      maxGramCandidates = 0L)
      .as[(String, String, Int)].collect().toSet
    assert(got === naive(2, strs))
    assert(got.size >= 3) // the planted near-dups were found
    // and the measured gate picks the SAME answer on the plain path
    assert(FuzzyJoin.selfPairs(strs.toDF("s"), "s", 2)
      .as[(String, String, Int)].collect().toSet === got)
  }

  test("two-sided matches finds cross-table pairs and dedups values first") {
    val l = Seq("silver ingot", "silver ingot", "copper coil")
      .toDF("name")
    val r = Seq("silvery ingot", "coppre coil", "steel beam").toDF("label")
    val got = FuzzyJoin.matches(l, "name", r, "label", 2)
      .as[(String, String, Int)].collect().toSet
    assert(got === Set(("silver ingot", "silvery ingot", 1),
      ("copper coil", "coppre coil", 2)))
  }

  test("the gram path, not the short bucket, carries long strings (candidate work is bounded)") {
    // 60 long strings in 3 well-separated families: candidates stay
    // within families (shared grams), never the full cross product
    val fams = Seq("alpha particle stream", "benthic zone survey",
      "cryogenic pump array")
    val strs = for (f <- fams; i <- 0 until 20) yield s"$f $i"
    val df = strs.toDF("s")
    val cand = FuzzyJoin.selfPairs(df, "s", 1)
    assert(cand.as[(String, String, Int)].collect().toSet ===
      naive(1, strs))
    // a string of one family never pairs with another family
    assert(cand.filter(substring(col("a"), 1, 5) =!=
      substring(col("b"), 1, 5)).count() === 0)
  }

  test("the short bucket's work is bounded by its cheaper strategy estimate") {
    // 300 distinct 4-8 char codes: correct under the measured-work
    // planner, and a budget at the cross-product size (300² = 90k)
    // admits the run — the bucket's work is capped by min(index,
    // cross), never an unbounded cartesian
    val codes = (0 until 100).flatMap(i =>
      Seq(f"ab$i%03d", f"ab$i%03dx", f"zq$i%03dyw"))
    val df = codes.toDF("s")
    assert(FuzzyJoin.selfPairs(df, "s", 2)
      .as[(String, String, Int)].collect().toSet === naive(2, codes))
    FuzzyJoin.selfPairs(df, "s", 2, maxShortCandidates = 90000L).collect()
  }

  test("a sparse short inventory rides the 1-gram index under a sub-cross budget") {
    // hash-scattered 5-char codes over a 36-char alphabet: Σ df² sits
    // well under the cross product, so a budget just BELOW the cross
    // size still admits the run — proving the index path carries it
    val alpha = "abcdefghijklmnopqrstuvwxyz0123456789"
    val codes = (0 until 40).map { i =>
      val h = i * 2654435761L
      (0 until 5).map(p => alpha(((h >> (p * 6)) % 36).toInt)).mkString
    }.distinct
    val budget = codes.size.toLong * codes.size - 1
    val got = FuzzyJoin.selfPairs(codes.toDF("s"), "s", 1,
        maxShortCandidates = budget)
      .as[(String, String, Int)].collect().toSet
    assert(got === naive(1, codes))
  }

  test("boundary-shift pairs survive the positional filter") {
    // deleting the first 2 chars shifts every surviving char by 2 —
    // exactly maxDist, the positional filter's edge
    val df = Seq("abcdefgh", "cdefgh", "", "ab").toDF("s")
    val got = FuzzyJoin.selfPairs(df, "s", 2)
      .as[(String, String, Int)].collect().toSet
    assert(got === naive(2, Seq("abcdefgh", "cdefgh", "", "ab")))
    assert(got.contains(("abcdefgh", "cdefgh", 2)))
    assert(got.contains(("", "ab", 2))) // tiny bucket: no grams at all
  }

  test("stored gram statistics answer every plan gate: zero pricing jobs, answers identical") {
    // VERDICT r14 #4: the collectNdv pattern for fuzzy joins — a
    // stored inventory's gram-df sidecar + candidate-work scalars
    // replace the per-query pricing aggregates entirely
    val root = java.nio.file.Files
      .createTempDirectory("graft-fuzzy-stored").toString + "/t"
    import graft.operators.SnapshotTable
    SnapshotTable.commit(vocab.zipWithIndex.toDF("s", "id"), root)
    FuzzyJoin.collectGramStats(spark, root, "s", maxDist = 2)

    FuzzyJoin.pricingJobs.set(0L)
    val got = FuzzyJoin.selfPairsStored(spark, root, "s", 2)
      .as[(String, String, Int)].collect().toSet
    assert(FuzzyJoin.pricingJobs.get() === 0L,
      "every gate must answer from the sidecar scalars")
    assert(got === naive(2))

    // without sidecar coverage (different q) the fallback prices per
    // query — answer-identical, jobs > 0
    FuzzyJoin.pricingJobs.set(0L)
    val fb = FuzzyJoin.selfPairsStored(spark, root, "s", 2, q = 4)
      .as[(String, String, Int)].collect().toSet
    assert(FuzzyJoin.pricingJobs.get() > 0L)
    assert(fb === naive(2))

    // the stored SIGNATURE path (gate forced shut) joins the sidecar
    // ranking — still complete, still zero pricing
    FuzzyJoin.pricingJobs.set(0L)
    val sig = FuzzyJoin.selfPairsStored(spark, root, "s", 2,
      maxGramCandidates = 0L)
      .as[(String, String, Int)].collect().toSet
    assert(FuzzyJoin.pricingJobs.get() === 0L)
    assert(sig === naive(2))
  }

  test("a pathological short inventory refuses loudly instead of exploding") {
    val dense = (0 until 400).map(i => f"c$i%03d").toDF("s")
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.selfPairs(dense, "s", 2, maxShortCandidates = 1000L)
        .collect()
    }
    assert(e.getMessage.contains("maxShortCandidates"))
  }
}
