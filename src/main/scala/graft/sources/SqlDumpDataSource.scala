package graft.sources

import java.util
import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** §2.8: the INSERT-dump parser as a first-class DataSource V2 format —
  * `spark.read.format("sqldump").load(dir or files…)` yields the same
  * (src_file, row_idx, stmt_cols, vals, kinds) frame as
  * `SqlDumpSource.readChunked`, with one input partition per
  * statement-aligned byte chunk. Options: `charset` (UTF-8 | GB18030 |
  * binary | auto, default UTF-8), `minChunkBytes` (split threshold,
  * default 256 MiB).
  *
  * Chunk planning (the skim for `;` boundaries) runs driver-side on a
  * small thread pool — the same planning I/O `readChunked` does in a
  * Spark job; the parallel re-read afterwards is the part that scales
  * (reference split planning: parser.go:504-535).
  */
final class SqlDumpDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sqldump"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SqlDumpSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SqlDumpTable(new CaseInsensitiveStringMap(properties))
}

private final class SqlDumpTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "sqldump"
  override def schema(): StructType = SqlDumpSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(o.asCaseSensitiveMap())
    new SqlDumpScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private final class SqlDumpScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = SqlDumpSource.schema
  override def toBatch: Batch = this

  // the SESSION's Hadoop conf, not a bare `new Configuration()`: session-
  // level FS settings (s3a credentials/endpoints, custom schemes) must
  // reach path expansion, chunk planning, and the partition readers
  private val hadoopConf =
    new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)

  private def paths: Seq[String] = {
    val fromPaths = Option(options.get("paths")).map { js =>
      // DataFrameReader.load(paths: _*) passes a JSON string array
      """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(js)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    }.getOrElse(Nil)
    val fromPath = Option(options.get("path")).toSeq
    val roots = (fromPaths ++ fromPath).distinct
    require(roots.nonEmpty, "sqldump: no path given")
    // expand directories to their .sql files
    val conf = hadoopConf.value
    roots.flatMap { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      val fs = p.getFileSystem(conf)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile)
          .map(_.getPath.toString).filter(_.endsWith(".sql")).sorted
      else Seq(r)
    }
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val charset = Option(options.get("charset")).getOrElse("UTF-8")
    val minChunk = Option(options.get("minChunkBytes")).map(_.toLong)
      .getOrElse(256L * 1024 * 1024)
    val sorted = paths
    // skim files for split points on a bounded driver-side pool
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(8, math.max(1, sorted.size)))
    try {
      val futures = sorted.map { path =>
        pool.submit(new java.util.concurrent.Callable[Seq[SqlDumpSource.DumpChunk]] {
          override def call(): Seq[SqlDumpSource.DumpChunk] =
            SqlDumpSource.planChunksForCharset(path, hadoopConf.value,
              minChunk, charset)
        })
      }
      futures.flatMap(_.get()).map(ch =>
        SqlDumpInputPartition(ch.path, ch.start, ch.end, ch.baseRow, charset)
          : InputPartition).toArray
    } finally pool.shutdown()
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new SqlDumpReaderFactory(hadoopConf)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream = {
    val charset = Option(options.get("charset")).getOrElse("UTF-8")
    val minChunk = Option(options.get("minChunkBytes")).map(_.toLong)
      .getOrElse(256L * 1024 * 1024)
    val conf = hadoopConf
    new FileDiscoveryMicroBatchStream(() => paths,
      path => SqlDumpSource.planChunksForCharset(path, conf.value, minChunk,
          charset)
        .map(ch => SqlDumpInputPartition(ch.path, ch.start, ch.end,
          ch.baseRow, charset): InputPartition),
      new SqlDumpReaderFactory(conf),
      checkpointLocation = Some(checkpointLocation),
      hadoopConf = Some(conf.value))
  }
}

/** Offset = count of discovered files (dump files are immutable once
  * written — the mydumper contract — so "how many files have been taken"
  * fully describes progress). */
private[sources] final case class FileCountOffset(n: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json: String = n.toString
}

/** §2.7×§2.8: a dump DIRECTORY as a streaming source — continuous import.
  * `spark.readStream.format(…).load(dir)` turns a growing directory into
  * micro-batches of parsed rows; align + writeStream append makes the
  * import pipeline incremental (AvailableNow = catch-up runs). Shared by
  * the `sqldump` and `graftcsv` formats.
  *
  * Each micro-batch takes the files that appeared since the last offset;
  * within a batch, a large file still splits via `planFile` (statement-
  * aligned chunks / byte ranges), so one huge shard parallelizes exactly
  * like the batch path.
  *
  * Restart safety: the ordered discovery log is PERSISTED under the
  * stream's checkpointLocation (atomic temp+rename rewrite whenever new
  * files are appended, BEFORE the offset referencing them can be
  * committed to the WAL). A committed offset is a position in that
  * persisted log — not in a listing rebuilt at restart — so a new file
  * that sorts before already-committed files can neither shift committed
  * positions (duplicates) nor be skipped: it appends at the log's tail
  * and ships in the next batch. An offset beyond the persisted log (log
  * deleted / foreign checkpoint) fails loudly instead of re-ingesting. */
private[sources] final class FileDiscoveryMicroBatchStream(
    listFiles: () => Seq[String],
    planFile: String => Seq[InputPartition],
    readerFactory: PartitionReaderFactory,
    checkpointLocation: Option[String] = None,
    hadoopConf: Option[Configuration] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream {
  import org.apache.spark.sql.connector.read.streaming.Offset
  import org.apache.hadoop.fs.Path

  // ordered discovery log: index position = offset unit; files are only
  // ever appended (name-sorted within each refresh)
  private val discovered = scala.collection.mutable.ArrayBuffer.empty[String]
  private val seen = scala.collection.mutable.HashSet.empty[String]

  private val LogPrefix = "graft_file_log"

  private def logDir: Option[Path] = checkpointLocation.map(new Path(_))

  private def logFs(p: Path) =
    p.getFileSystem(hadoopConf.getOrElse(new Configuration()))

  /** (version, name) of every complete persisted log generation; -1 is the
    * legacy unversioned name. Sidecars (`.crc`) and temps never match. */
  private def logGenerations(fs: org.apache.hadoop.fs.FileSystem,
      d: Path): Seq[(Long, String)] =
    if (!fs.exists(d)) Nil
    else fs.listStatus(d).toSeq.map(_.getPath.getName).flatMap { n =>
      if (n == LogPrefix) Some((-1L, n))
      else if (n.startsWith(LogPrefix + "."))
        n.stripPrefix(LogPrefix + ".").toLongOption.map(v => (v, n))
      else None
    }.sortBy(_._1)

  // next generation to write; bumped past whatever restart loaded
  private var logVersion: Long = 0L

  // restart path: the persisted log IS the offset space — load the highest
  // complete generation first (versioned files are only ever created by a
  // temp+rename-to-NEW-name swap, so every generation on disk is complete;
  // the old delete-then-rename of a single name had a window where a crash
  // left NO log and a restart silently rebuilt the offset space from a
  // fresh listing — the reordering duplicate/skip case the log prevents)
  logDir.foreach { d =>
    val fs = logFs(d)
    logGenerations(fs, d).lastOption.foreach { case (v, n) =>
      val in = fs.open(new Path(d, n))
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      body.linesIterator.filter(_.nonEmpty).foreach { f =>
        if (!seen.contains(f)) { seen += f; discovered += f }
      }
      logVersion = v + 1
    }
  }

  private def persistLog(): Unit = logDir.foreach { d =>
    val fs = logFs(d)
    fs.mkdirs(d)
    val tmp = new Path(d, s".$LogPrefix.tmp")
    val out = fs.create(tmp, true)
    try out.write(discovered.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    val target = new Path(d, s"$LogPrefix.$logVersion")
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"cannot persist file discovery log $target")
    // best-effort prune of superseded generations (never the one just
    // written) — a crash here merely leaves an extra old file behind
    logGenerations(fs, d).foreach { case (v, n) =>
      if (v < logVersion)
        try fs.delete(new Path(d, n), false)
        catch { case _: java.io.IOException => () }
    }
    logVersion += 1
  }

  private def refresh(): Unit = synchronized {
    var added = false
    listFiles().sorted.foreach { f =>
      if (!seen.contains(f)) { seen += f; discovered += f; added = true }
    }
    if (added) persistLog()
  }

  override def initialOffset(): Offset = FileCountOffset(0)
  override def deserializeOffset(json: String): Offset =
    FileCountOffset(json.trim.toLong)
  override def latestOffset(): Offset = { refresh(); FileCountOffset(discovered.size) }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    refresh()
    val s = start.asInstanceOf[FileCountOffset].n.toInt
    val e = end.asInstanceOf[FileCountOffset].n.toInt
    if (e > discovered.size) throw new IllegalStateException(
      s"committed offset $e exceeds the persisted discovery log " +
        s"(${discovered.size} files) — the checkpoint's WAL and the file " +
        "log disagree; refusing to re-ingest from a rebuilt listing")
    discovered.slice(s, e).flatMap(planFile).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = readerFactory
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

private final case class SqlDumpInputPartition(path: String, start: Long,
    end: Long, baseRow: Long, charset: String) extends InputPartition

private final class SqlDumpReaderFactory(
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[SqlDumpInputPartition]
    new SqlDumpPartitionReader(p, conf)
  }
}

private final class SqlDumpPartitionReader(p: SqlDumpInputPartition,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {
  private val rows = SqlDumpSource.parseChunk(
    SqlDumpSource.DumpChunk(p.path, p.start, p.end, p.baseRow),
    conf.value, p.charset)
  private var current: InternalRow = _

  override def next(): Boolean =
    if (rows.hasNext) {
      val r = rows.next()
      current = InternalRow(
        UTF8String.fromString(r.getString(0)),
        r.getLong(1),
        Option(r.get(2)).map(_ => new GenericArrayData(
          r.getSeq[String](2).map(UTF8String.fromString).toArray[Any])).orNull,
        new GenericArrayData(r.getSeq[String](3)
          .map(s => if (s == null) null else UTF8String.fromString(s)).toArray[Any]),
        new GenericArrayData(r.getSeq[Int](4).toArray[Any]))
      true
    } else false

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
