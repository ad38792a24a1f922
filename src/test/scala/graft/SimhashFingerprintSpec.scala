package graft

import org.apache.spark.sql.functions._

import graft.functions.SimhashFingerprint
import graft.sources.Tables

/** Native SimHash fingerprint: parity with the declarative fold. */
class SimhashFingerprintSpec extends GraftSuite {

  test("graft_simhash equals the double-aggregate fold on real word hashes") {
    SimhashFingerprint.register(spark)
    val sid = graft.functions.Hashing.sid60Spark("s")
    val hs = Tables.documents(spark, sf)
      .withColumn("words", array_distinct(split(trim(lower(col("text"))), "\\s+")))
      .filter(size(col("words")) > 0)
      .withColumn("hs", expr(s"transform(words, s -> $sid)"))
      .select("doc_id", "hs").persist()
    val both = hs.select(
      SimhashFingerprint.fingerprint(col("hs")).as("native"),
      expr("aggregate(sequence(0, 59), 0L, (acc, b) -> " +
        "acc + if(aggregate(hs, 0L, (a2, h) -> " +
        "a2 + if((shiftright(h, b) & 1) = 1, 1L, -1L)) > 0, shiftleft(1L, b), 0L))")
        .as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    assert(both.count() === 500)
    hs.unpersist()
  }
}
