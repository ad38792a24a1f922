package graft.operators

import java.math.{BigDecimal => JBigDecimal, BigInteger}
import java.nio.charset.StandardCharsets.UTF_8
import scala.collection.parallel.CollectionConverters._
import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.column.statistics.Statistics
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.types

/** Per-file row counts and column min/max lifted from PARQUET FOOTERS
  * — the metadata a write job's own tasks already produced, so a
  * commit can record `__rows` and skipping bounds WITHOUT re-reading a
  * byte of the data it just wrote (the Iceberg writer discipline; the
  * r10 read-back scan doubled `pipeline_governed`). Footers are
  * KB-sized regardless of file size: a thousand-file commit reads a
  * thousand footers, never the 100 TB under them.
  *
  * Conservative by construction — a column is reported in `unusable`
  * (caller falls back to a column-pruned scan) whenever the footer
  * can't be trusted to reproduce Spark's own min/max semantics:
  *   - INT96 timestamps (Spark's default physical type; parquet
  *     defines no sort order for them — set
  *     `spark.sql.parquet.outputTimestampType=TIMESTAMP_MICROS`, as
  *     graft's entry points do, and timestamps lift for free);
  *   - FLOAT/DOUBLE (the parquet spec's min/max EXCLUDE NaN, while
  *     Spark's max() ranks NaN above everything — footer bounds would
  *     silently understate);
  *   - files without Spark's schema key-value metadata (non-Spark
  *     writers), nested columns, or any block whose statistics are
  *     absent.
  * Binary (string) statistics are exact: parquet-mr's chunk-level
  * statistics truncation default is Integer.MAX_VALUE (untruncated),
  * and its unsigned byte-wise order equals UTF8String's. */
private[graft] object FooterStats {

  /** One data file's footer numbers. `file` is the root-relative path
    * in the URI-encoded form `input_file_name()` reports (what the
    * stats sidecar stores); `bounds` maps a usable column to its
    * (min, max) as Spark EXTERNAL values — (null, null) for an
    * all-null file; `schema` is the writer-recorded Spark schema
    * (empty when unknown). */
  final case class FileStat(file: String, rows: Long,
                            schema: types.StructType,
                            bounds: Map[String, (Any, Any)],
                            unusable: Set[String])

  private val SparkSchemaKey = "org.apache.spark.sql.parquet.row.metadata"

  /** All data files under a version directory (skips `_`/`.`-prefixed
    * sidecars and temp dirs at every level). */
  def dataFiles(versionDir: String): Seq[String] = {
    if (!MetaIO.isDir(versionDir)) return Seq.empty
    def walk(d: String): Seq[String] =
      MetaIO.list(d).flatMap { p =>
        val n = MetaIO.name(p)
        if (n.startsWith("_") || n.startsWith(".")) Seq.empty
        else if (MetaIO.isDir(p)) walk(p)
        else if (n.endsWith(".parquet")) Seq(p)
        else Seq.empty
      }
    walk(versionDir)
  }

  /** Footer-read every data file under `versionDir` (driver-side, in
    * parallel — a footer is KBs) and report rows + bounds for `cols`.
    * `tableRoot` anchors the stored root-relative path. */
  def collect(tableRoot: String, versionDir: String, cols: Seq[String],
              conf: Configuration): Seq[FileStat] = {
    val files = dataFiles(versionDir)
    // parallel footer reads: one small remote GET per file on an
    // object store; ordered result for a deterministic sidecar
    files.toVector.par.map(f => one(tableRoot, f, cols, conf)).seq
  }

  private def one(tableRoot: String, file: String, cols: Seq[String],
                  conf: Configuration): FileStat = {
    val rel = file.stripPrefix(tableRoot.stripSuffix("/")).stripPrefix("/")
    // store the URI-encoded form input_file_name() reports (readers
    // decode once): java.net.URI's multi-arg constructor quotes the
    // same layer — '%' and raw spaces — Hadoop's Path.toUri adds
    val stored = new java.net.URI(null, null, rel, null).getRawPath
    val reader = ParquetFileReader.open(
      HadoopInputFile.fromPath(new HPath(file), conf))
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val schema = Option(
        footer.getFileMetaData.getKeyValueMetaData.get(SparkSchemaKey))
        .flatMap(j => scala.util.Try(
          types.DataType.fromJson(j).asInstanceOf[types.StructType]).toOption)
      schema match {
        case None =>
          FileStat(stored, rows, types.StructType(Nil), Map.empty, cols.toSet)
        case Some(sc) =>
          val wanted = cols.filter(c => sc.fieldNames.contains(c))
          val (bounds, bad) = wanted.foldLeft(
            (Map.empty[String, (Any, Any)], Set.empty[String])) {
            case ((bs, us), c) =>
              columnBounds(blocks, c, sc(c).dataType) match {
                case Some(b) => (bs + (c -> b), us)
                case None => (bs, us + c)
              }
          }
          FileStat(stored, rows, sc, bounds, bad)
      }
    } finally reader.close()
  }

  /** Merge one column's (min, max) across a file's row groups; None ⇔
    * unusable (fall back to a scan). */
  private def columnBounds(blocks: Seq[org.apache.parquet.hadoop.metadata.BlockMetaData],
                           col: String, dt: types.DataType)
      : Option[(Any, Any)] = {
    var min: Any = null
    var max: Any = null
    val ord = ordering(dt).getOrElse(return None)
    for (b <- blocks) {
      val chunk = b.getColumns.asScala.find { c =>
        val p = c.getPath.toArray
        p.length == 1 && p(0) == col
      }.getOrElse(return None)
      val prim = chunk.getPrimitiveType
      if (prim.getPrimitiveTypeName == PrimitiveTypeName.INT96) return None
      val st: Statistics[_] = chunk.getStatistics
      if (st == null) return None
      else if (st.hasNonNullValue) {
        val lo = convert(st.genericGetMin, prim, dt).getOrElse(return None)
        val hi = convert(st.genericGetMax, prim, dt).getOrElse(return None)
        if (min == null || ord.compare(lo, min) < 0) min = lo
        if (max == null || ord.compare(hi, max) > 0) max = hi
      } else if (st.isNumNullsSet && st.getNumNulls == chunk.getValueCount) {
        () // all-null row group: contributes nothing
      } else return None
    }
    Some((min, max))
  }

  /** Spark-value-space ordering for merging row-group bounds; the
    * supported types' value order equals parquet's logical sort order
    * (strings compare by unsigned UTF-8 bytes on both sides). */
  private def ordering(dt: types.DataType): Option[Ordering[Any]] = {
    def of[T](o: Ordering[T]): Option[Ordering[Any]] =
      Some(o.asInstanceOf[Ordering[Any]])
    dt match {
      case types.IntegerType => of(Ordering.Int)
      case types.LongType => of(Ordering.Long)
      case types.ShortType => of(Ordering.Short)
      case types.ByteType => of(Ordering.Byte)
      case types.BooleanType => of(Ordering.Boolean)
      case types.StringType => of(new Ordering[String] {
        def compare(a: String, b: String): Int = utf8Compare(a, b)
      })
      case types.DateType => of(Ordering.by((d: java.sql.Date) => d.getTime))
      case types.TimestampType =>
        of(Ordering.by((t: java.sql.Timestamp) =>
          (t.getTime, t.getNanos)))
      case types.TimestampNTZType =>
        of(Ordering.fromLessThan[java.time.LocalDateTime](_ isBefore _))
      case _: types.DecimalType =>
        of(Ordering.fromLessThan[JBigDecimal]((a, b) => a.compareTo(b) < 0))
      case _ => None // FLOAT/DOUBLE deliberately excluded (NaN), rest unsupported
    }
  }

  /** Unsigned byte-wise UTF-8 comparison — UTF8String's order. */
  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(UTF_8); val y = b.getBytes(UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** One raw footer statistic value → the Spark EXTERNAL value of
    * `dt`; None ⇔ an unexpected physical/logical combination. */
  private def convert(v: Any, prim: org.apache.parquet.schema.PrimitiveType,
                      dt: types.DataType): Option[Any] = {
    import PrimitiveTypeName._
    (dt, prim.getPrimitiveTypeName) match {
      case (types.IntegerType, INT32) => Some(v.asInstanceOf[Int])
      case (types.ShortType, INT32) => Some(v.asInstanceOf[Int].toShort)
      case (types.ByteType, INT32) => Some(v.asInstanceOf[Int].toByte)
      case (types.LongType, INT64) => Some(v.asInstanceOf[Long])
      case (types.BooleanType, BOOLEAN) => Some(v.asInstanceOf[Boolean])
      case (types.StringType, BINARY) =>
        Some(new String(v.asInstanceOf[Binary].getBytes, UTF_8))
      case (types.DateType, INT32) =>
        Some(java.sql.Date.valueOf(
          java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong)))
      case (types.TimestampType, INT64) =>
        timestampMicros(v.asInstanceOf[Long], prim).map { us =>
          val secs = Math.floorDiv(us, 1000000L)
          val nanos = Math.floorMod(us, 1000000L) * 1000L
          java.sql.Timestamp.from(
            java.time.Instant.ofEpochSecond(secs, nanos))
        }
      case (types.TimestampNTZType, INT64) =>
        timestampMicros(v.asInstanceOf[Long], prim).map { us =>
          java.time.LocalDateTime.ofEpochSecond(
            Math.floorDiv(us, 1000000L),
            (Math.floorMod(us, 1000000L) * 1000L).toInt,
            java.time.ZoneOffset.UTC)
        }
      case (d: types.DecimalType, INT32) =>
        Some(new JBigDecimal(
          BigInteger.valueOf(v.asInstanceOf[Int].toLong), d.scale))
      case (d: types.DecimalType, INT64) =>
        Some(new JBigDecimal(
          BigInteger.valueOf(v.asInstanceOf[Long]), d.scale))
      case (d: types.DecimalType, BINARY | FIXED_LEN_BYTE_ARRAY) =>
        Some(new JBigDecimal(
          new BigInteger(v.asInstanceOf[Binary].getBytes), d.scale))
      case _ => None
    }
  }

  /** The micros value of an INT64 timestamp statistic (MILLIS and
    * MICROS only — NANOS would truncate a bound). */
  private def timestampMicros(
      v: Long, prim: org.apache.parquet.schema.PrimitiveType): Option[Long] =
    prim.getLogicalTypeAnnotation match {
      case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
        t.getUnit match {
          case LogicalTypeAnnotation.TimeUnit.MICROS => Some(v)
          case LogicalTypeAnnotation.TimeUnit.MILLIS => Some(v * 1000L)
          case _ => None
        }
      case _ => None
    }
}
