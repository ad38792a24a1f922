package graft.sources

import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.SnapshotTable

/** The sink's idempotency-key contract: a writer id comes from the
  * engine's queryId local property or an explicit txnAppId — NEVER a
  * per-table fallback (two writers sharing one key silently skip each
  * other's batch ids; ADVICE r10). */
class GraftSinkIdSpec extends graft.GraftSuite {
  import spark.implicits._

  test("sink refuses a missing writer id instead of a shared per-table fallback") {
    val root =
      java.nio.file.Files.createTempDirectory("graft-sinkid").toString + "/t"
    val df = Seq(("a", 1L, "d1")).toDF("k", "n", "day")
    // outside a micro-batch thread there is no sql.streaming.queryId
    // local property
    spark.sparkContext.setLocalProperty("sql.streaming.queryId", null)
    val noId = new GraftSink(root, Seq("day"), OutputMode.Append(),
      new CaseInsensitiveStringMap(java.util.Map.of("path", root)))
    val e = intercept[IllegalStateException] { noId.addBatch(0L, df) }
    assert(e.getMessage.contains("txnAppId"))
    // an explicit txnAppId in the same situation commits fine
    val withId = new GraftSink(root, Seq("day"), OutputMode.Append(),
      new CaseInsensitiveStringMap(
        java.util.Map.of("path", root, "txnAppId", "w1")))
    withId.addBatch(0L, df)
    withId.addBatch(0L, df) // replay: already stamped, skipped
    assert(SnapshotTable.read(spark, root).count() === 1L)
  }
}
