package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Catalog, CurationRun}
import graft.streaming.CurationStream

/** Streaming curation: checkpointed document shards drain through the
  * governed pipeline, one atomic catalog commit per micro-batch, with
  * cross-batch dedup against the catalog's signature store. */
class CurationStreamSpec extends GraftSuite {
  import spark.implicits._

  private val base =
    "quick brown foxes jump over lazy dogs while festival crowds " +
      "gather near old stone bridges to watch boats drift slowly " +
      "beneath autumn lanterns before evening markets open"
  private val other =
    "entirely different reports describing broadcast hash joins " +
      "shuffle partitions catalyst rules tungsten codegen and adaptive " +
      "execution stages measured across many terabytes of parquet scans"

  test("shards drain exactly-once; cross-shard dups resolve via the governed store") {
    val src = Files.createTempDirectory("graft-cstream-src").toString
    val cat = Files.createTempDirectory("graft-cstream-cat").toString
    val ckp = Files.createTempDirectory("graft-cstream-ckp").toString

    // file-source dirs must be uniform: each shard is a subdir-free
    // parquet file set under srcDir (glob reads the whole dir)
    Seq(1L -> base, 2L -> other).toDF("doc_id", "text")
      .coalesce(1).write.mode("append").parquet(src)
    CurationStream.curateDocuments(spark, src, cat, ckp)
    assert(Catalog.read(spark, cat, "corpus").count() === 2)
    assert(CurationRun.keptCorpus(spark, cat).count() === 2)
    val c1 = Catalog.latestCommit(cat)

    // re-drain with NOTHING new: the checkpoint yields no batch, the
    // catalog does not advance (no junk commits, no double-publish)
    CurationStream.curateDocuments(spark, src, cat, ckp)
    assert(Catalog.latestCommit(cat) === c1)
    assert(Catalog.read(spark, cat, "corpus").count() === 2)

    // wave 2: doc 10 near-duplicates STORED doc 1 (cross-BATCH dedup
    // via the catalog's signature table — wave 1 is never re-read)
    Seq(10L -> (base + " extra"),
      11L -> ("fresh coverage of vector search inverted file indexes " +
        "coarse quantizers probe lists recall curves plus brute " +
        "force baselines every approximate method gets judged against"))
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    CurationStream.curateDocuments(spark, src, cat, ckp)

    val corpus = Catalog.read(spark, cat, "corpus")
    assert(corpus.count() === 4)
    val v10 = corpus.filter(col("doc_id") === 10L).head()
    assert(v10.getAs[Boolean]("is_dup") && !v10.getAs[Boolean]("keep"))
    assert(v10.getAs[Long]("canonical_id") === 1L)
    // batches landed as distinct atomic commits with distinct batch ids
    assert(Catalog.latestCommit(cat) > c1)
    assert(corpus.select("batch_id").distinct().count() === 2)
  }

  test("startContinuous starts on an EMPTY source dir with an explicit schema") {
    val src = Files.createTempDirectory("graft-cstream-cont-src").toString
    val cat = Files.createTempDirectory("graft-cstream-cont-cat").toString
    val ckp = Files.createTempDirectory("graft-cstream-cont-ckp").toString
    val schema = Seq.empty[(Long, String)].toDF("doc_id", "text").schema
    // the normal deployment order: the poller is up BEFORE the first
    // crawl shard lands (inference-based start would throw here)
    val q = CurationStream.startContinuous(spark, src, cat, ckp,
      intervalMs = 100L, srcSchema = Some(schema))
    try {
      Seq(1L -> base).toDF("doc_id", "text").coalesce(1)
        .write.mode("append").parquet(src)
      val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
      while (Catalog.latestCommit(cat) < 0 && System.nanoTime() < deadline)
        Thread.sleep(100L)
      assert(Catalog.read(spark, cat, "corpus").count() === 1)
    } finally q.stop()
  }

  test("a poisoned shard fails the query and publishes nothing") {
    val src = Files.createTempDirectory("graft-cstream-bad-src").toString
    val cat = Files.createTempDirectory("graft-cstream-bad-cat").toString
    val ckp = Files.createTempDirectory("graft-cstream-bad-ckp").toString
    // every doc is the same text: all but the canonical dedup away →
    // keep-rate 1/6 < 0.2 default gate
    Seq(1L -> base, 2L -> base, 3L -> base, 4L -> base, 5L -> base,
      6L -> base)
      .toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(src)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      CurationStream.curateDocuments(spark, src, cat, ckp)
    }
    assert(e.getCause.getMessage.contains("curation gate failed"))
    // nothing became visible: no published catalog commit
    assert(Catalog.latestCommit(cat) === -1L)
  }
}
