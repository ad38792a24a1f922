package graft

import scala.util.Random

import graft.operators.{Dedup, MergeUpsert}

/** Randomized (fixed-seed) invariants for the hashing/merge contracts. */
class PropertySpec extends GraftSuite {

  test("md5Prefix60 kernel equals the SQL conv(substr(md5)) path for random strings") {
    import spark.implicits._
    val rnd = new Random(42)
    val strs = (Seq("a", "hello", "the quick brown fox", "0", " ") ++
      (1 to 200).map(_ => rnd.alphanumeric.take(rnd.nextInt(40) + 1).mkString) ++
      (1 to 50).map(_ => (1 to rnd.nextInt(20) + 1)
        .map(_ => (rnd.nextInt(94) + 33).toChar).mkString)).distinct
    val md = java.security.MessageDigest.getInstance("MD5")
    val sqlSide = strs.toDF("s").selectExpr(
      "s", "cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint) as h")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    strs.foreach { s =>
      assert(Dedup.md5Prefix60(md, s) === sqlSide(s),
        s"kernel/SQL hash mismatch for '$s'")
    }
  }

  test("merge is idempotent and respects key partition (randomized)") {
    import spark.implicits._
    val rnd = new Random(7)
    (1 to 5).foreach { _ =>
      val target = (1 to 30).map(_ => (rnd.nextInt(16).toLong, rnd.nextInt(1000)))
        .distinctBy(_._1).toDF("id", "v")
      val source = (1 to 10).map(_ => (rnd.nextInt(16).toLong, rnd.nextInt(1000)))
        .distinctBy(_._1).toDF("id", "v")
      val once = MergeUpsert.merge(target, source, "id")
      val twice = MergeUpsert.merge(once, source, "id")
      assert(once.exceptAll(twice).count() === 0)
      assert(twice.exceptAll(once).count() === 0)
      val srcMap = source.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val tgtMap = target.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val out = once.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(out.keySet === srcMap.keySet ++ tgtMap.keySet)
      srcMap.foreach { case (k, v) => assert(out(k) === v) }
      tgtMap.foreach { case (k, v) =>
        if (!srcMap.contains(k)) assert(out(k) === v)
      }
    }
  }

  test("capped ngram restores exact scores via frequent-shingle overlap") {
    import spark.implicits._
    // every doc shares a boilerplate tail -> its shingles exceed cap=5
    val boiler = "alpha beta gamma delta epsilon"
    val docs = ((1 to 30).map(i =>
        (i.toLong, s"unique$i words body$i item$i thing$i $boiler")) ++
      Seq((101L, s"pair one same text here $boiler"),
          (102L, s"pair one same text here $boiler"),
          (201L, boiler), (202L, boiler))).toDF("doc_id", "text")
    val uncapped = Dedup.ngramJaccard(docs, 0.5, maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = Dedup.ngramJaccard(docs, 0.5, maxDocFreq = Some(5))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // identical docs sharing BOTH rare and frequent shingles: the score
    // must be exactly 1.0 — only the frequent-set overlap restores the
    // boilerplate shingles the capped index dropped
    assert(capped((101L, 102L)) === 1.0)
    // capped results are a subset of uncapped with identical scores
    capped.foreach { case (k, j) => assert(uncapped(k) === j) }
    // the documented recall bound: a pair sharing ONLY above-cap
    // shingles is found uncapped but not capped
    assert(uncapped((201L, 202L)) === 1.0)
    assert(!capped.contains((201L, 202L)))
  }

  test("cluster resolution labels every doc with its component minimum") {
    import spark.implicits._
    // a path graph (needs multiple propagation rounds) + an isolated pair
    val pairs = ((1 to 14).map(i => (i.toLong, i + 1L, 0.9)) ++
      Seq((100L, 101L, 0.95))).toDF("doc_a", "doc_b", "jaccard")
    val c = Dedup.clusters(pairs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    (1L to 15L).foreach { v =>
      assert(c(v) === ((1L, v == 1L)), s"doc $v")
    }
    assert(c(100L) === ((100L, true)) && c(101L) === ((100L, false)))
    // exactly one canonical doc per cluster
    assert(c.values.count(_._2) === 2)
  }

  test("fraction-scaled cap resolves to max(floor, fraction*corpus) and matches the absolute cap") {
    val docs = graft.sources.Tables.documents(spark, sf).limit(150)
    // 150 docs * 0.02 = 3 < floor 100 -> floor wins: identical to cap=100
    val scaled = Dedup.ngramJaccardScaled(docs, 0.5, capFraction = 0.02, capFloor = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val absolute = Dedup.ngramJaccard(docs, 0.5, maxDocFreq = Some(100))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(scaled === absolute)
  }

  test("ngram jaccard with a doc-frequency cap yields a subset with identical scores") {
    val docs = graft.sources.Tables.documents(spark, sf).limit(200)
    // maxDocFreq = None: the uncapped EXACT index is the baseline (the
    // default is the capped path, which would make this cap-vs-cap)
    val full = Dedup.ngramJaccard(docs, 0.5, maxDocFreq = None)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val capped = Dedup.ngramJaccard(docs, 0.5, maxDocFreq = Some(20))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(capped.keySet.subsetOf(full.keySet))
    capped.foreach { case (k, j) => assert(full(k) === j) } // scores exact
  }

  test("asof join equals the naive latest-at-or-before lookup (randomized)") {
    import spark.implicits._
    val rnd = new Random(11)
    val keys = Seq("a", "b", "c")
    val left = (1 to 80).map(i =>
      (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(500).toLong))
    // right rows must be unique per (key, ts)
    val right = (1 to 60).map(i =>
      (keys(rnd.nextInt(3)), rnd.nextInt(500).toLong, i.toDouble))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val got = graft.operators.AsofJoin.asof(
        left.toDF("id", "k", "ts"), right.toDF("k", "rts", "v"),
        Seq("k"), "ts", "rts", Seq("v"))
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[Any]("v")))
      .toMap
    left.foreach { case (id, k, ts) =>
      val expect = right.filter(r => r._1 == k && r._2 <= ts)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(id) === expect, s"asof mismatch for left row $id")
    }
  }

  test("bucketed asof equals plain asof on random tapes at any bucket size") {
    import spark.implicits._
    val rnd = new Random(13)
    (1 to 3).foreach { round =>
      val keys = Seq("a", "b", "c")
      val left = (1 to 80).map(i =>
        (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(500).toLong))
        .toDF("id", "k", "ts")
      val right = (1 to 60).map(i =>
        (keys(rnd.nextInt(3)), rnd.nextInt(500).toLong, i.toDouble))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .toDF("k", "rts", "v")
      val plain = graft.operators.AsofJoin.asof(
        left, right, Seq("k"), "ts", "rts", Seq("v"))
      // bucket size must never change results — only parallelism
      Seq(1L, 7L, 60L, 100000L).foreach { bs =>
        val bucketed = graft.operators.AsofJoin.asofBucketed(
          left, right, Seq("k"), "ts", "rts", Seq("v"), bucketSeconds = bs)
        assert(plain.exceptAll(bucketed.select(plain.columns.map(
          org.apache.spark.sql.functions.col): _*)).count() === 0,
          s"round $round bucketSeconds=$bs diverged from plain asof")
        assert(bucketed.count() === 80L)
      }
    }
  }

  test("curation report keep-count is monotone under adding a duplicate") {
    import spark.implicits._
    val rnd = new Random(17)
    val base = (1 to 20).map { i =>
      val words = (1 to 10 + rnd.nextInt(20)).map(j => s"w${rnd.nextInt(50)}j$j")
      (i.toLong, words.mkString(" "), s"src${1 + rnd.nextInt(3)}")
    }
    val d = base.toDF("doc_id", "text", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("bigint"))
    val keeps0 = graft.operators.TextAnalysis.curationReport(d)
      .filter("keep").collect().map(_.getLong(0)).toSet
    // duplicating an existing doc under a HIGHER doc_id never changes
    // the keep set: the canonical (min doc_id) copy still wins
    val dup = base.take(5).map { case (id, t, s) => (id + 1000L, t, s) }
    val d2 = (base ++ dup).toDF("doc_id", "text", "source")
      .withColumn("n_chars",
        org.apache.spark.sql.functions.length(
          org.apache.spark.sql.functions.col("text")).cast("bigint"))
    val keeps1 = graft.operators.TextAnalysis.curationReport(d2)
      .filter("keep").collect().map(_.getLong(0)).toSet
    assert(keeps1 === keeps0)
  }

  test("interval join equals the naive theta join on random tapes at any width") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_seconds}
    val rnd = new Random(19)
    (1 to 3).foreach { round =>
      val keys = Seq("a", "b", "c")
      val intervals = (1 to 60).map { i =>
        val s = rnd.nextInt(1000).toLong
        (i.toLong, keys(rnd.nextInt(3)), s, s + rnd.nextInt(120).toLong)
      }.toDF("iv_id", "k", "s_sec", "e_sec")
        .select(col("iv_id"), col("k"),
          timestamp_seconds(col("s_sec")).cast("timestamp_ntz").as("start"),
          timestamp_seconds(col("e_sec")).cast("timestamp_ntz").as("end"))
      val points = (1 to 120).map(i =>
        (i.toLong, keys(rnd.nextInt(3)), rnd.nextInt(1100).toLong))
        .toDF("pt_id", "k", "t_sec")
        .select(col("pt_id"), col("k"),
          timestamp_seconds(col("t_sec")).cast("timestamp_ntz").as("ts"))
      val naive = intervals.join(points, Seq("k"))
        .filter(col("ts") >= col("start") && col("ts") < col("end"))
        .select("iv_id", "pt_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val w = Seq(1L, 13L, 60L, 1000L)(rnd.nextInt(4))
      val got = graft.operators.RangeJoin.intervalJoin(
          intervals, points, Seq("k"), "start", "end", "ts", w)
        .select("iv_id", "pt_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got === naive, s"round $round width $w")
    }
  }
}
