package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** §2.8: Lightning-flavoured CSV as a first-class DataSource V2 format —
  * the sibling of the `sqldump` source for the reference's other dump
  * format. Both faces:
  *
  *   spark.read.format("graftcsv").option("ncols", 5).load(dir or files…)
  *   spark.readStream.format("graftcsv")…   (new files = micro-batches)
  *
  * Output contract matches `CsvSource.readIndexed`: all-string positional
  * columns `c0…c{n-1}` plus deterministic row handles (`src_file`,
  * `row_off` = the line's byte offset) — stable under any split plan, so
  * downstream row-id allocation survives retries and repartitioning.
  *
  * Scale shape: files split into byte ranges (`maxPartitionBytes`, default
  * 128 MiB) — a 100 GiB file parses as ~800 tasks. Range boundaries use
  * the standard convention: a partition owns the lines that START inside
  * its range, skipping the partial first line unless it begins the file.
  * Line-boundary seeks are byte-safe for every supported charset (GB18030
  * multibyte sequences never contain 0x0A; UTF-8 likewise).
  *
  * Options mirror `CsvConfig`: ncols (required), separator, delimiter,
  * backslashEscape, nullRepr, notNull, header, trimLastSep, charset
  * (UTF-8 | GB18030 | binary | auto). `multiLine` (quoted newlines) is
  * NOT supported here — that quirk is non-splittable by nature; use
  * `CsvSource.readWholeFileIndexed`.
  */
final class CsvDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftcsv"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    CsvDataSource.schemaFor(CsvDataSource.ncolsOf(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new GraftCsvTable(new CaseInsensitiveStringMap(properties))
}

object CsvDataSource {
  def ncolsOf(options: CaseInsensitiveStringMap): Int = {
    val n = options.getInt("ncols", -1)
    require(n > 0, "graftcsv: option `ncols` (positive column count) is required")
    n
  }

  def schemaFor(ncols: Int): StructType = StructType(
    (0 until ncols).map(i => StructField(s"c$i", StringType, nullable = true)) ++
      Seq(StructField("src_file", StringType, nullable = false),
        StructField("row_off", LongType, nullable = false)))

  def cfgOf(options: CaseInsensitiveStringMap): CsvConfig = {
    require(!options.getBoolean("multiLine", false),
      "graftcsv: multiLine CSV is non-splittable; use CsvSource.readWholeFileIndexed")
    CsvConfig(
      separator = Option(options.get("separator")).getOrElse(","),
      delimiter = Option(options.get("delimiter")).getOrElse("\""),
      header = options.getBoolean("header", false),
      notNull = options.getBoolean("notNull", false),
      nullRepr = Option(options.get("nullRepr")).getOrElse("\\N"),
      backslashEscape = options.getBoolean("backslashEscape", true),
      trimLastSep = options.getBoolean("trimLastSep", false),
      charset = Option(options.get("charset")).getOrElse("UTF-8"))
  }
}

private final class GraftCsvTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "graftcsv"
  override def schema(): StructType =
    CsvDataSource.schemaFor(CsvDataSource.ncolsOf(options))
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new util.HashMap[String, String](options.asCaseSensitiveMap())
    merged.putAll(o.asCaseSensitiveMap())
    new GraftCsvScanBuilder(new CaseInsensitiveStringMap(merged))
  }
}

private final class GraftCsvScanBuilder(options: CaseInsensitiveStringMap)
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType =
    CsvDataSource.schemaFor(CsvDataSource.ncolsOf(options))
  override def toBatch: Batch = this

  private val hadoopConf =
    new org.apache.spark.util.SerializableConfiguration(
      org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  private val ncols = CsvDataSource.ncolsOf(options)
  private val cfg = CsvDataSource.cfgOf(options)
  private val maxPart = Option(options.get("maxPartitionBytes")).map(_.toLong)
    .getOrElse(128L * 1024 * 1024)

  private def paths: Seq[String] = {
    val fromPaths = Option(options.get("paths")).map { js =>
      """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(js)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq
    }.getOrElse(Nil)
    val fromPath = Option(options.get("path")).toSeq
    val roots = (fromPaths ++ fromPath).distinct
    require(roots.nonEmpty, "graftcsv: no path given")
    val conf = hadoopConf.value
    roots.flatMap { r =>
      val p = new org.apache.hadoop.fs.Path(r)
      val fs = p.getFileSystem(conf)
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.filter(_.isFile)
          .map(_.getPath.toString).filter(_.endsWith(".csv")).sorted
      else Seq(r)
    }
  }

  private def planFile(path: String): Seq[InputPartition] = {
    val conf = hadoopConf.value
    val p = new org.apache.hadoop.fs.Path(path)
    val size = p.getFileSystem(conf).getFileStatus(p).getLen
    val cs = CsvSource.resolveCharset(path, conf, cfg.charset)
    val nSplits = math.max(1L, (size + maxPart - 1) / maxPart)
    (0L until nSplits).map { k =>
      GraftCsvInputPartition(path, k * maxPart,
        math.min(size, (k + 1) * maxPart), cs, ncols, cfg): InputPartition
    }
  }

  override def planInputPartitions(): Array[InputPartition] =
    paths.flatMap(planFile).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftCsvReaderFactory(hadoopConf)

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new FileDiscoveryMicroBatchStream(() => paths, planFile,
      new GraftCsvReaderFactory(hadoopConf),
      checkpointLocation = Some(checkpointLocation),
      hadoopConf = Some(hadoopConf.value))
}

private final case class GraftCsvInputPartition(path: String, start: Long,
    end: Long, charset: String, ncols: Int, cfg: CsvConfig)
    extends InputPartition

private final class GraftCsvReaderFactory(
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new GraftCsvPartitionReader(
      partition.asInstanceOf[GraftCsvInputPartition], conf)
}

/** Byte-range line reader + per-line univocity parse (same settings as
  * `CsvSource.readWholeFileIndexed`, so null/empty semantics agree). */
private final class GraftCsvPartitionReader(p: GraftCsvInputPartition,
    conf: org.apache.spark.util.SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val hp = new org.apache.hadoop.fs.Path(p.path)
  private val in = hp.getFileSystem(conf.value).open(hp)
  private val buffered = {
    in.seek(p.start)
    new java.io.BufferedInputStream(in, 256 * 1024)
  }
  private var pos = p.start
  private val cs = java.nio.charset.Charset.forName(p.charset)
  private val parser = {
    val settings = new com.univocity.parsers.csv.CsvParserSettings
    settings.getFormat.setDelimiter(p.cfg.separator.charAt(0))
    settings.getFormat.setQuote(
      if (p.cfg.delimiter.isEmpty) '\u0000' else p.cfg.delimiter.charAt(0))
    settings.getFormat.setQuoteEscape(
      if (p.cfg.backslashEscape) '\\' else '\u0000')
    settings.setNullValue("")
    settings.setEmptyValue("")
    settings.setMaxColumns(math.max(16, p.ncols + 4))
    settings.setMaxCharsPerColumn(-1)
    new com.univocity.parsers.csv.CsvParser(settings)
  }

  // a partition owns lines STARTING in [start, end); if start > 0 the
  // partial (or exactly-preceding) line belongs to the previous partition
  if (p.start > 0) skipLine()

  private var current: InternalRow = _

  /** Read raw bytes to the next '\n' (exclusive) or EOF; advances pos. */
  private def readLineBytes(): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(256)
    var b = buffered.read()
    while (b != -1 && b != '\n') {
      out.write(b)
      pos += 1
      b = buffered.read()
    }
    if (b == '\n') pos += 1
    val bytes = out.toByteArray
    // tolerate \r\n
    if (bytes.nonEmpty && bytes.last == '\r') java.util.Arrays.copyOf(bytes, bytes.length - 1)
    else bytes
  }

  private def skipLine(): Unit = {
    var b = buffered.read()
    while (b != -1 && b != '\n') { pos += 1; b = buffered.read() }
    if (b == '\n') pos += 1
  }

  override def next(): Boolean = {
    var advanced = false
    while (!advanced) {
      val lineStart = pos
      // Hadoop LineRecordReader convention: this partition READS the line
      // starting exactly at its end boundary — the next partition's
      // unconditional skipLine consumes that same line, so exactly one
      // partition owns it
      if (lineStart > p.end) return false
      val bytes = readLineBytes()
      if (pos == lineStart) return false // EOF with nothing read
      val isHeader = p.cfg.header && lineStart == 0L
      if (bytes.nonEmpty && !isHeader) {
        val rec = parser.parseLine(new String(bytes, cs))
        if (rec != null) {
          val vals = (0 until p.ncols).map { i =>
            val v = if (rec != null && i < rec.length) rec(i) else null
            val s = if (v == null) "" else v
            if (!p.cfg.notNull && s == p.cfg.nullRepr) null
            else s
          }
          current = InternalRow.fromSeq(
            vals.map(v => if (v == null) null else UTF8String.fromString(v)) ++
              Seq(UTF8String.fromString(p.path), lineStart))
          advanced = true
        }
      }
      // blank lines and the header are skipped (univocity does the same)
    }
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
