package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque binary payloads + typed metadata.
  *
  * Images / audio / video are carried as `binary` columns with a typed
  * metadata struct alongside — the Spark-side plumbing (schema,
  * batched partition-wise decode, deterministic feature shape) is real;
  * the actual media decode is STUBBED (no codec libraries in this
  * environment) with a deterministic byte-level feature extractor, so
  * every downstream contract (schema, partitioning, batch shape) is
  * testable.
  *
  * Scale: payloads never leave their partition — `mapPartitions`
  * processes each batch locally (the Scala analog of `mapInPandas`
  * batching), and the metadata projection is codegen'd, so a 100 TB
  * media table streams through without a shuffle.
  */
object Multimodal {

  /** Typed row for the decode path. */
  case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  /** Deterministic fake features standing in for a real decoder. */
  case class MediaFeatures(doc_id: Long, mime: String, byte_len: Long,
                           checksum: Long, feature: Array[Double])

  /** Build the multimodal table from documents: binary payload (utf-8
    * bytes as the opaque blob) + typed metadata columns. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      when(col("doc_id") % 3 === 0, "image/png")
        .when(col("doc_id") % 3 === 1, "audio/wav")
        .otherwise("video/mp4").as("mime"),
      when(col("doc_id") % 3 === 0, lit(64) + (col("doc_id") % 16) * 16)
        .otherwise(lit(null).cast("long")).as("width"),
      when(col("doc_id") % 3 === 0, lit(64) + (col("doc_id") % 8) * 32)
        .otherwise(lit(null).cast("long")).as("height"),
      when(col("doc_id") % 3 =!= 0, (col("doc_id") % 120) + 1)
        .otherwise(lit(null).cast("long")).as("duration_s"))

  /** Declarative metadata extraction (the oracle-checked query):
    * payload length, content digest, header byte, typed metadata. */
  def metadata(docs: DataFrame): DataFrame =
    mediaTable(docs)
      .withColumn("byte_len", length(col("payload")).cast("bigint"))
      .withColumn("payload_md5", md5(col("payload")))
      .drop("payload")

  /** Frame sampling: fan a video payload out into one row per sampled
    * frame. The "frame" here is a deterministic fixed-stride byte slice
    * (a real deployment swaps the slice for an ffmpeg keyframe decode —
    * not present in this container); the Spark plumbing is the real
    * thing: binary slicing + `posexplode` fan-out stay narrow, so a
    * 100 TB video table samples without any shuffle.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int = 64,
                   maxFrames: Int = 8): DataFrame =
    media
      .filter(col("mime") === "video/mp4")
      .withColumn("n_frames",
        least(ceil(length(col("payload")).cast("double") / frameBytes)
          .cast("int"), lit(maxFrames)))
      // empty payload -> n_frames = 0; sequence(0, -1) DESCENDS in
      // Spark, so it must not reach the generator
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"), col("n_frames"),
        posexplode(expr("sequence(0, n_frames - 1)"))
          .as(Seq("frame_idx", "frame_off_mult")))
      .withColumn("frame_offset", col("frame_idx") * frameBytes)
      .withColumn("frame",
        expr(s"substring(payload, frame_offset + 1, $frameBytes)"))
      .select(
        col("doc_id"), col("frame_idx"), col("frame_offset"),
        length(col("frame")).cast("bigint").as("frame_len"),
        md5(col("frame")).as("frame_md5"))

  /** STUB decoder: a real deployment would decode/resize/frame-sample
    * here (libjpeg/ffmpeg et al. — not present in this container). The
    * stub derives a deterministic 8-dim feature vector from the raw
    * bytes so the batching/schema contract is fully exercised. */
  def decodeFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select("doc_id", "mime", "payload").as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.payload
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += (bytes(i) & 0xff); i += 1 }
          val feat = Array.tabulate(8) { k =>
            var acc = 0L
            var j = k
            while (j < bytes.length) { acc += (bytes(j) & 0xff); j += 8 }
            acc.toDouble / math.max(1, bytes.length / 8)
          }
          MediaFeatures(r.doc_id, r.mime, bytes.length.toLong, sum, feat)
        }
      }
  }
}
