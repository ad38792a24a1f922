package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.operators.CurationRun

/** STREAMING training-data curation — the continuous form of
  * [[graft.operators.CurationRun]]: a checkpointed document stream
  * (crawl shards landing as parquet files) where every micro-batch is
  * cleaned, scored, deduplicated against the governed cross-batch
  * signature store, and published as ONE atomic catalog commit.
  *
  * Exactly-once falls out of composing two existing contracts, the
  * same way [[GovernedStream]] composes `foreachBatch` with the
  * batch-id table: Structured Streaming's `foreachBatch` replays a
  * micro-batch (same id, same file set — the file source's offsets are
  * checkpointed) when the sink committed but the checkpoint write
  * crashed, and [[CurationRun.runBatch]] already records its batch id
  * as corpus partition METADATA inside the same atomic commit as the
  * data — so a replayed batch returns the current commit untouched.
  * No second bookkeeping table is needed; the corpus manifest IS the
  * transaction log.
  *
  * A RED QUALITY GATE (batch keep-rate below `minKeepRate`, a poisoned
  * crawl shard) deliberately FAILS the query: nothing of the batch is
  * published, the staged slice stays on disk for debugging, and a
  * restart replays the same batch into the same gate — the pipeline
  * HALTS until an operator raises the threshold, retracts the shard
  * from `srcDir`, or fixes the producer. A curation sink that silently
  * skips poisoned shards would publish a corpus hole nobody audited.
  *
  * Contract: batch ids are checkpoint-scoped. One ingestion driver
  * (one checkpoint) owns a catalog's corpus — deleting the checkpoint
  * while keeping the catalog would re-number batches from 0 and replay
  * DIFFERENT content against already-committed ids. (The same
  * txnAppId/txnVersion restriction every transactional foreachBatch
  * sink documents.)
  *
  * Scale: per trigger this costs O(micro-batch) — [[CurationRun]]
  * stages the batch's rows only, the MinHash store is probed via the
  * banded equi-join (never rescanned), and appends are partition
  * fast-appends. `maxFilesPerTrigger` is the backpressure valve: a
  * backlog of crawl shards drains as bounded batches.
  */
object CurationStream {

  /** Drain every document file currently under `srcDir` through the
    * governed curation pipeline (Trigger.AvailableNow), one atomic
    * catalog commit per micro-batch. Restartable: re-invoking after
    * new shards land processes only the new files. */
  def curateDocuments(spark: SparkSession, srcDir: String,
                      catalogRoot: String, checkpointDir: String,
                      threshold: Double = 0.8, minKeepRate: Double = 0.2,
                      substringWindow: Option[Int] = None,
                      maxFilesPerTrigger: Option[Int] = None,
                      srcSchema: Option[StructType] = None): Unit =
    start(spark, srcDir, catalogRoot, checkpointDir, threshold,
      minKeepRate, substringWindow, Trigger.AvailableNow(),
      maxFilesPerTrigger, srcSchema).awaitTermination()

  /** The long-running form: keeps polling `srcDir` every `intervalMs`
    * for new shards. The caller owns the query lifecycle. Pass
    * `srcSchema` to start the poller BEFORE the first shard lands
    * (schema inference needs at least one file) and to skip the
    * per-restart footer read. */
  def startContinuous(spark: SparkSession, srcDir: String,
                      catalogRoot: String, checkpointDir: String,
                      threshold: Double = 0.8, minKeepRate: Double = 0.2,
                      substringWindow: Option[Int] = None,
                      intervalMs: Long = 1000L,
                      maxFilesPerTrigger: Int = 4,
                      srcSchema: Option[StructType] = None): StreamingQuery =
    start(spark, srcDir, catalogRoot, checkpointDir, threshold,
      minKeepRate, substringWindow, Trigger.ProcessingTime(intervalMs),
      Some(maxFilesPerTrigger), srcSchema)

  private def start(spark: SparkSession, srcDir: String,
                    catalogRoot: String, checkpointDir: String,
                    threshold: Double, minKeepRate: Double,
                    substringWindow: Option[Int], trigger: Trigger,
                    maxFilesPerTrigger: Option[Int],
                    srcSchema: Option[StructType]): StreamingQuery = {
    val schema = srcSchema.getOrElse(spark.read.parquet(srcDir).schema)
    val reader0 = spark.readStream.schema(schema)
    val reader = maxFilesPerTrigger.fold(reader0)(m =>
      reader0.option("maxFilesPerTrigger", m.toString))
    reader.parquet(srcDir)
      .writeStream
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        // an empty trigger publishes nothing (and must not burn the
        // batch id with a junk commit — runBatch's exactly-once skip
        // keys off PUBLISHED ids, so an unused id is simply unused)
        if (!b.isEmpty)
          CurationRun.runBatch(b.sparkSession, catalogRoot, b, id,
            threshold, minKeepRate, substringWindow)
        ()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
  }
}
