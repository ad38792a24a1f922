package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

/** The EXCLUSIVE-COMMIT primitive behind [[MetaIO]]'s object-store
  * mode — the one piece of the protocol an object store cannot
  * provide. S3 gives atomic full-object PUT, GET, LIST, DELETE, but
  * (in the classic contract the reference deploys against —
  * `infrastructure/seaweedfs/s3.json` + `processing/spark_jobs/
  * spark_config.py` pointing Iceberg at s3a warehouse paths) neither
  * atomic rename nor exclusive create, so "exactly one writer wins"
  * must be decided somewhere else. This is Iceberg's catalog-commit
  * answer: every exclusivity point (catalog commit locks, version-dir
  * claims, branch locks, create-only publishes) is arbitrated by a
  * backend with a real test-and-set — a filesystem with exclusive
  * create, a DynamoDB conditional put, a JDBC unique row — and the
  * visible marker/manifest files on the object store become DERIVED
  * CACHES the arbitration winner writes with plain atomic PUTs.
  *
  * Keys are the metadata paths themselves (one arbitration domain per
  * protocol file), so the seam slots under [[MetaIO]] without the
  * protocol code knowing which mode it runs in.
  */
private[graft] trait CommitArbiter {

  /** Atomically create entry `key` — the test-and-set: exactly one
    * concurrent caller wins; losers get
    * `java.nio.file.FileAlreadyExistsException` (the seam's one
    * canonical already-exists type). `content` is durable with the
    * entry so a loser can read what the winner recorded even before
    * the winner's derived-cache PUT lands. */
  def createExclusive(key: String, content: String = ""): Unit

  def exists(key: String): Boolean

  /** The content recorded at `key`'s creation (None = no entry). */
  def read(key: String): Option[String]

  /** Release exactly `key` (a lock release; missing = no-op). */
  def delete(key: String): Unit

  /** Release `key` and every key under it (mirror of a recursive
    * delete of a claimed directory tree; missing = no-op). */
  def deleteTree(key: String): Unit
}

/** A [[CommitArbiter]] backed by a directory on a filesystem with REAL
  * primitives (exclusive create) — the in-sandbox stand-in for the
  * DynamoDB / JDBC arbiter a production S3 deployment would use, and a
  * faithful one: both expose exactly `createExclusive` + `delete`.
  * Entries mirror the key's path hierarchy under `root` (leaf +
  * `.__arb`), so releasing a claimed subtree is one recursive delete
  * and two arbiters over different roots never collide. */
private[graft] final class FileArbiter(root: String) extends CommitArbiter {

  // one arbitration domain per normalized path: `file:`-scheme URIs
  // and the plain absolute spelling of the same path must share a key
  private def segments(key: String): Seq[String] =
    key.replaceFirst("^file:/+", "/")
      .split('/').toSeq.filter(_.nonEmpty)
      .map(_.replace(":", "%3A"))

  private def entry(key: String): Path =
    Paths.get(root, (segments(key).init :+ (segments(key).last + ".__arb")): _*)

  private def subtree(key: String): Path =
    Paths.get(root, segments(key): _*)

  override def createExclusive(key: String, content: String): Unit = {
    val e = entry(key)
    Files.createDirectories(e.getParent)
    // CREATE_NEW is the atomic test-and-set: one winner, losers throw
    // java.nio.file.FileAlreadyExistsException
    Files.write(e, content.getBytes(UTF_8), StandardOpenOption.CREATE_NEW,
      StandardOpenOption.WRITE)
    ()
  }

  override def exists(key: String): Boolean = Files.exists(entry(key))

  override def read(key: String): Option[String] =
    if (Files.exists(entry(key))) Some(Files.readString(entry(key))) else None

  override def delete(key: String): Unit =
    Files.deleteIfExists(entry(key))

  override def deleteTree(key: String): Unit = {
    delete(key)
    val d = subtree(key)
    if (Files.exists(d)) {
      val stream = Files.walk(d)
      try stream.iterator().asScala.toSeq.reverse.foreach(p =>
        Files.deleteIfExists(p))
      finally stream.close()
    }
  }
}
