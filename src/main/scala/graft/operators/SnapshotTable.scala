package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Versioned parquet table: snapshots, time travel, rollback, expiry.
  *
  * The reference gets these from Iceberg (`compaction.py:30-80` calls
  * its snapshot procedures); no table-format jars ship here, so the
  * same capability class is a directory-of-versions protocol:
  * `<root>/v=N/` holds the full snapshot for version N and a
  * `_latest` marker file names the current version. Writers publish a
  * new version directory then atomically move the marker — readers of
  * any existing version are never disturbed (copy-on-write semantics,
  * the same isolation Iceberg's copy-on-write mode gives).
  *
  * Scale: a snapshot write is one distributed parquet job; commit is a
  * single tiny marker rename. Time-travel reads are ordinary
  * partition-pruned scans of one version directory.
  */
object SnapshotTable {

  private def markerPath(root: String) = Paths.get(root, "_latest")

  /** Latest committed version, or -1 if none. */
  def latestVersion(root: String): Long = {
    val m = markerPath(root)
    if (Files.exists(m)) Files.readString(m).trim.toLong else -1L
  }

  /** All committed versions present on disk, ascending. */
  def versions(root: String): Seq[Long] = {
    val d = Paths.get(root)
    if (!Files.exists(d)) return Seq.empty
    val stream = Files.list(d)
    try stream.iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith("v="))
      .map(_.stripPrefix("v=").toLong)
      .toSeq.sorted
    finally stream.close()
  }

  private def moveMarker(root: String, version: Long): Unit = {
    Files.createDirectories(Paths.get(root))
    val tmp = Paths.get(root, s"_latest.tmp$version")
    Files.writeString(tmp, version.toString)
    Files.move(tmp, markerPath(root),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** Atomically claim a version directory. `Files.createDirectory` is
    * atomic on POSIX: of two writers racing to the same version number,
    * exactly one wins — the loser fails fast here instead of silently
    * clobbering the winner's files with `mode("overwrite")`. */
  private[graft] def claimVersion(root: String, version: Long): Unit = {
    Files.createDirectories(Paths.get(root))
    try Files.createDirectory(Paths.get(root, s"v=$version"))
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new java.util.ConcurrentModificationException(
          s"snapshot version $version at $root already exists " +
            "(concurrent committer or unexpired leftover); retry to " +
            "target the next free version")
    }
  }

  /** Publish `df` as the next snapshot; returns the new version.
    * The next version is max(existing)+1, NOT marker+1 — after a
    * rollback the still-on-disk newer versions must never be
    * overwritten in place (copy-on-write isolation). The version dir is
    * claimed atomically first, so a concurrent committer racing to the
    * same version number fails instead of silently overwriting. */
  def commit(df: DataFrame, root: String): Long = {
    val next = versions(root).lastOption.getOrElse(-1L) + 1
    claimVersion(root, next)
    df.write.mode("overwrite").parquet(s"$root/v=$next")
    moveMarker(root, next)
    next
  }

  /** Read the current snapshot (or a specific `version` — time travel). */
  def read(spark: SparkSession, root: String, version: Long = -1L): DataFrame = {
    val v = if (version >= 0) version else latestVersion(root)
    require(v >= 0, s"no committed version at $root")
    spark.read.parquet(s"$root/v=$v")
  }

  /** MERGE-upsert `source` into the table on `key` and commit the
    * result as a new snapshot (the reference's silver MERGE,
    * `bronze_to_silver.py:156-188`, with explicit versioning). */
  def mergeCommit(spark: SparkSession, root: String, source: DataFrame,
                  key: String): Long =
    commit(MergeUpsert.merge(read(spark, root), source, key), root)

  /** Roll back: re-point the marker at an existing older version
    * (atomic, like commit). */
  def rollback(root: String, version: Long): Unit = {
    require(versions(root).contains(version), s"unknown version $version")
    moveMarker(root, version)
  }

  /** Change data feed between two committed versions — the Delta CDF /
    * Iceberg changelog analog: row-level inserts, deletes, and updates
    * keyed by `key`, derived by diffing the two snapshots (full outer
    * join on the key; an update is a key present in both whose non-key
    * columns differ). `_change_type` ∈ insert | delete |
    * update_preimage | update_postimage, plus `_commit_version`.
    *
    * Scale: one shuffle joining the two snapshots on the key; at a
    * deployment the snapshots are parquet tables so the join prunes to
    * changed partitions when the key embeds the partition column. */
  def changes(spark: SparkSession, root: String, key: String,
              fromVersion: Long, toVersion: Long): DataFrame = {
    val from = read(spark, root, fromVersion)
    val to = read(spark, root, toVersion)
    val dataCols = from.columns.filterNot(_ == key).toSeq
    require(dataCols.toSet == to.columns.filterNot(_ == key).toSet,
      "schema drift between versions is not diffable by changes()")
    val f = from.select(col(key).as("_k"),
      struct(dataCols.map(col): _*).as("_before"))
    val t = to.select(col(key).as("_k"),
      struct(dataCols.map(col): _*).as("_after"))
    val j = f.join(t, Seq("_k"), "full_outer")
    val ins = j.filter(col("_before").isNull)
      .select(col("_k"), col("_after").as("_row"),
        lit("insert").as("_change_type"))
    val del = j.filter(col("_after").isNull)
      .select(col("_k"), col("_before").as("_row"),
        lit("delete").as("_change_type"))
    val upd = j.filter(col("_before").isNotNull && col("_after").isNotNull &&
      col("_before") =!= col("_after"))
    val pre = upd.select(col("_k"), col("_before").as("_row"),
      lit("update_preimage").as("_change_type"))
    val post = upd.select(col("_k"), col("_after").as("_row"),
      lit("update_postimage").as("_change_type"))
    ins.unionByName(del).unionByName(pre).unionByName(post)
      .select(col("_k").as(key) +: dataCols.map(c => col(s"_row.$c")) :+
        col("_change_type") :+ lit(toVersion).as("_commit_version"): _*)
  }

  /** Expire old snapshots, keeping the current one, the newest
    * `retainLast` versions older than it, and EVERY version newer than
    * it: after a rollback, newer versions are roll-forward targets and
    * must survive expiry. Returns the versions removed. */
  def expireSnapshots(root: String, retainLast: Int): Seq[Long] = {
    val current = latestVersion(root)
    val expire = versions(root).filter(_ < current)
      .sorted.dropRight(math.max(retainLast, 0))
    expire.foreach { v =>
      val dir = Paths.get(root, s"v=$v")
      Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(Files.delete)
    }
    expire
  }
}
