package graft.operators

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths, StandardCopyOption, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{CreateFlag, FileContext, Options, Path => HPath}
import org.apache.hadoop.fs.permission.FsPermission

/** The table/catalog METADATA IO seam — every filesystem touch of the
  * snapshot-format protocol (markers, manifests, sidecars, claims,
  * locks) goes through here, so the format runs wherever a Hadoop
  * `FileSystem` does. The protocol needs exactly two primitives beyond
  * plain read/write/list:
  *
  *   - ATOMIC RENAME (publish: marker moves, sidecar swaps) —
  *     `FileContext.rename(..., OVERWRITE)`, atomic on HDFS; local
  *     paths use java.nio `ATOMIC_MOVE`.
  *   - EXCLUSIVE CREATE (claims and locks: version-dir claims, catalog
  *     commit locks) — `create(path, overwrite = false)`, atomic on
  *     HDFS; local paths use `CREATE_NEW`. Directory claims compose
  *     mkdirs + an exclusive `.claim` file (generic `mkdirs` is
  *     idempotent and cannot claim).
  *
  * Dispatch: a path carrying a URI scheme (`file://`, `hdfs://`, …)
  * routes through Hadoop; a plain absolute path uses java.nio directly
  * (identical semantics, none of the Hadoop local-FS overhead on the
  * hot path). Setting `GRAFT_IO_FORCE_HADOOP` in the environment
  * routes EVERYTHING through Hadoop — how the suite proves the seam
  * end to end against `file://` (Spark's RawLocalFileSystem).
  *
  * S3/object-store strategy (documented, not sandbox-testable): S3
  * gives neither atomic rename nor exclusive create, so on S3 the
  * format runs in CATALOG-ARBITRATED mode — exactly what [[Catalog]]
  * already is: every publish is a catalog commit decided by the
  * catalog's own lock (which lives on a filesystem with real
  * primitives, or a DynamoDB/JDBC-style arbiter behind this same
  * seam), and per-table markers become derived caches. This is the
  * Iceberg catalog-commit answer; reference deployment:
  * `infrastructure/seaweedfs/s3.json` + `processing/spark_jobs/
  * spark_config.py` pointing the warehouse at s3a paths. */
private[graft] object MetaIO {

  private val forceHadoop = sys.env.contains("GRAFT_IO_FORCE_HADOOP")

  // a URI scheme prefix — matches both "file:///x" and the engine's
  // single-slash "file:/x" form, never a plain absolute path
  private val SchemePrefix = "^[A-Za-z][A-Za-z0-9+.-]*:/".r

  private def viaHadoop(p: String): Boolean =
    forceHadoop || SchemePrefix.findPrefixOf(p).isDefined

  private def conf: Configuration =
    try org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    catch { case _: Throwable => new Configuration() }

  private def hp(p: String) = new HPath(p)
  // FileContext, not FileSystem: its local implementation is the RAW
  // local fs (no `.crc` checksum sidecars that a mixed-path writer —
  // an external tool touching a metadata file directly — would trip),
  // and its rename carries the atomic OVERWRITE flag HDFS honors.
  // Memoized per (scheme, authority): unlike FileSystem.get,
  // FileContext instances are NOT cached by Hadoop, and a catalog
  // commit makes dozens of metadata touches — constructing a fresh
  // client per touch would tax every hdfs:// commit (FileContext is
  // documented thread-safe).
  private val fcCache =
    new java.util.concurrent.ConcurrentHashMap[String, FileContext]()
  private def fc(p: String): FileContext = {
    val uri = hp(p).toUri
    val key = s"${uri.getScheme}://${Option(uri.getAuthority).getOrElse("")}"
    fcCache.computeIfAbsent(key,
      _ => FileContext.getFileContext(uri, conf))
  }
  private def status(p: String) = fc(p).getFileStatus(hp(p))

  /** Join path segments with '/'. Operates on plain strings so `file://`
    * (and any other scheme) URIs flow through untouched — java.nio
    * `Paths.get` would reject them. */
  def join(parts: String*): String =
    parts.map(_.stripSuffix("/")).mkString("/")

  /** The last path segment (file or directory name). */
  def name(p: String): String =
    p.stripSuffix("/").substring(p.stripSuffix("/").lastIndexOf('/') + 1)

  def exists(p: String): Boolean =
    if (viaHadoop(p)) fc(p).util().exists(hp(p))
    else Files.exists(Paths.get(p))

  def isDir(p: String): Boolean =
    if (viaHadoop(p)) {
      val c = fc(p)
      c.util().exists(hp(p)) && c.getFileStatus(hp(p)).isDirectory
    } else Files.isDirectory(Paths.get(p))

  def mkdirs(p: String): Unit =
    if (viaHadoop(p)) {
      try fc(p).mkdir(hp(p), FsPermission.getDirDefault, true)
      catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => () }
    } else { Files.createDirectories(Paths.get(p)); () }

  def readString(p: String): String =
    if (viaHadoop(p)) {
      val in = fc(p).open(hp(p))
      try new String(in.readAllBytes(), UTF_8) finally in.close()
    } else Files.readString(Paths.get(p))

  /** Write (create or truncate). NOT atomic — protocol files that must
    * appear atomically write a tmp and [[rename]] it. */
  def writeString(p: String, s: String): Unit =
    if (viaHadoop(p)) {
      val out = fc(p).create(hp(p),
        java.util.EnumSet.of(CreateFlag.CREATE, CreateFlag.OVERWRITE),
        Options.CreateOpts.createParent())
      try out.write(s.getBytes(UTF_8)) finally out.close()
    } else { Files.writeString(Paths.get(p), s); () }

  /** EXCLUSIVE create — the lock/claim primitive: throws
    * `java.nio.file.FileAlreadyExistsException` (one canonical type
    * for every backend) when the path already exists. */
  def createExclusive(p: String, content: String = ""): Unit =
    if (viaHadoop(p)) {
      try {
        val out = fc(p).create(hp(p),
          java.util.EnumSet.of(CreateFlag.CREATE),
          Options.CreateOpts.createParent())
        try out.write(content.getBytes(UTF_8)) finally out.close()
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: org.apache.hadoop.fs.PathExistsException =>
          throw new java.nio.file.FileAlreadyExistsException(p)
        case e: java.io.IOException if e.getMessage != null &&
            e.getMessage.contains("already exists") =>
          throw new java.nio.file.FileAlreadyExistsException(p)
      }
    } else {
      Files.write(Paths.get(p), content.getBytes(UTF_8),
        StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      ()
    }

  /** EXCLUSIVE directory claim: exactly one concurrent claimer wins,
    * losers get `FileAlreadyExistsException`. Local = atomic
    * createDirectory; generic filesystems compose mkdirs (idempotent)
    * with an exclusive `.claim` dotfile — dot-prefixed, so every
    * listing in the format already ignores it. */
  def claimDir(p: String): Unit =
    if (viaHadoop(p)) {
      if (fc(p).util().exists(hp(p)))
        throw new java.nio.file.FileAlreadyExistsException(p)
      mkdirs(p)
      createExclusive(join(p, ".claim"))
    } else {
      Files.createDirectory(Paths.get(p))
      ()
    }

  /** ATOMIC rename. `overwrite = true` replaces an existing
    * destination FILE atomically (HDFS `Options.Rename.OVERWRITE`;
    * local `REPLACE_EXISTING + ATOMIC_MOVE`). Directory destinations
    * must not exist (callers delete first — the format never
    * overwrite-renames onto a live directory). */
  def rename(src: String, dst: String, overwrite: Boolean = false): Unit =
    if (viaHadoop(src)) {
      try {
        if (overwrite)
          fc(src).rename(hp(src), hp(dst), Options.Rename.OVERWRITE)
        else fc(src).rename(hp(src), hp(dst), Options.Rename.NONE)
      } catch {
        // one canonical already-exists type across backends — the
        // no-replace rename doubles as an exclusive-publish primitive
        case _: org.apache.hadoop.fs.FileAlreadyExistsException |
             _: org.apache.hadoop.fs.PathExistsException if !overwrite =>
          throw new java.nio.file.FileAlreadyExistsException(dst)
      }
    } else {
      if (overwrite)
        Files.move(Paths.get(src), Paths.get(dst),
          StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING)
      else if (Files.isDirectory(Paths.get(src))) {
        // directory targets (sidecar swaps) can't hard-link; the
        // caller deleted the destination first — the pre-check guards
        // the contract, the move stays atomic
        if (Files.exists(Paths.get(dst)))
          throw new java.nio.file.FileAlreadyExistsException(dst)
        Files.move(Paths.get(src), Paths.get(dst),
          StandardCopyOption.ATOMIC_MOVE)
      } else {
        // POSIX rename(2) silently REPLACES an existing destination
        // even under ATOMIC_MOVE — but link(2) atomically fails on
        // one, which is exactly the exclusive-publish contract
        // (immutable tags, create-only branches) this primitive
        // carries: link then unlink the source
        Files.createLink(Paths.get(dst), Paths.get(src))
        Files.delete(Paths.get(src))
      }
      ()
    }

  /** Immediate children as FULL paths (empty when `p` is missing or
    * not a directory). */
  def list(p: String): Seq[String] =
    if (viaHadoop(p)) {
      val c = fc(p)
      if (!c.util().exists(hp(p)) || !c.getFileStatus(hp(p)).isDirectory)
        Seq.empty
      else c.util().listStatus(hp(p)).toSeq
        .map(s => join(p, s.getPath.getName))
    } else {
      val d = Paths.get(p)
      if (!Files.isDirectory(d)) Seq.empty
      else {
        val stream = Files.list(d)
        try stream.iterator().asScala
          .map(c => join(p, c.getFileName.toString)).toSeq
        finally stream.close()
      }
    }

  /** Immediate child NAMES. */
  def listNames(p: String): Seq[String] = list(p).map(name)

  /** Every FILE under `p`, recursively, as full paths. */
  def walkFiles(p: String): Seq[String] =
    if (!exists(p)) Seq.empty
    else if (isDir(p)) list(p).flatMap(walkFiles)
    else Seq(p)

  /** Delete a file, or a whole tree with `recursive = true`. Missing
    * paths are a no-op. */
  def delete(p: String, recursive: Boolean = false): Unit =
    if (viaHadoop(p)) {
      if (fc(p).util().exists(hp(p))) { fc(p).delete(hp(p), recursive); () }
    } else {
      val path = Paths.get(p)
      if (Files.exists(path)) {
        if (recursive && Files.isDirectory(path)) {
          val stream = Files.walk(path)
          try stream.iterator().asScala.toSeq.reverse.foreach(Files.delete)
          finally stream.close()
        } else Files.delete(path)
      }
    }

  def mtimeMillis(p: String): Long =
    if (viaHadoop(p)) status(p).getModificationTime
    else Files.getLastModifiedTime(Paths.get(p)).toMillis

  def size(p: String): Long =
    if (viaHadoop(p)) status(p).getLen
    else Files.size(Paths.get(p))
}
