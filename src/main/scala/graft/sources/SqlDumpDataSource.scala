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

  private def logPath: Option[Path] =
    checkpointLocation.map(c => new Path(c, "graft_file_log"))

  private def logFs(p: Path) =
    p.getFileSystem(hadoopConf.getOrElse(new Configuration()))

  // restart path: the persisted log IS the offset space — load it first
  logPath.foreach { p =>
    val fs = logFs(p)
    if (fs.exists(p)) {
      val in = fs.open(p)
      val body = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      body.linesIterator.filter(_.nonEmpty).foreach { f =>
        if (!seen.contains(f)) { seen += f; discovered += f }
      }
    }
  }

  private def persistLog(): Unit = logPath.foreach { p =>
    val fs = logFs(p)
    fs.mkdirs(p.getParent)
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(discovered.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
    if (fs.exists(p)) fs.delete(p, false)
    if (!fs.rename(tmp, p))
      throw new java.io.IOException(s"cannot persist file discovery log $p")
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
