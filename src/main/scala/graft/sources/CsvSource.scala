package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** Lightning-flavoured CSV ingestion on top of `spark.read.csv`.
  *
  * Config surface mirrors the reference's `[mydumper.csv]` block
  * (reference: lightning/config/config.go:128-136 struct, 238-246 defaults,
  * 348-369 validation; quirk corpus tests/csv/). Spark's CSV reader
  * (univocity) covers nearly everything natively: 1-char separator, quote
  * delimiter, backslash escapes inside quoted fields, `\N` null, optional
  * header, multi-line quoted fields. Two quirks need post-read fixups,
  * applied as codegen'd Column expressions (no UDFs):
  *
  *  - `trim-last-separator`: mydumper may end each record with the
  *    separator; the last column gets an empty trailing value → drop it.
  *  - header=false: columns are positional `c0…cN` until permutation (P1)
  *    aligns them to the declared schema.
  *
  * Reads are splittable unless `multiLine` (quoted newlines) is on — same
  * trade-off the reference makes by re-parsing from row boundaries.
  * All columns load as StringType; typing happens in SchemaAlign (P3) so
  * cast errors carry SQL_MODE semantics instead of the CSV reader's.
  */
final case class CsvConfig(
    separator: String = ",",          // 1 char (config.go:348-352)
    delimiter: String = "\"",        // quote char; "" = no quoting
    header: Boolean = false,
    notNull: Boolean = false,         // true: no value is NULL
    nullRepr: String = "\\N",        // `null` in the TOML
    backslashEscape: Boolean = true,
    trimLastSep: Boolean = false,
    charset: String = "UTF-8",        // S7: also gb18030, binary, auto
    // quoted fields may contain newlines — forces whole-file (univocity)
    // parsing, one task per file; leave off for splittable line-based reads
    multiLine: Boolean = false)

object CsvSource {

  /** Read CSV files with Lightning semantics; all columns StringType.
    * `ncols` fixes the width when there is no header (positional c0…cN). */
  def read(spark: SparkSession, paths: Seq[String], cfg: CsvConfig,
           ncols: Int): DataFrame = {
    val base = spark.read
      .option("sep", cfg.separator)
      .option("quote", if (cfg.delimiter.isEmpty) "\u0000" else cfg.delimiter)
      .option("escape", if (cfg.backslashEscape) "\\" else "\u0000")
      .option("header", cfg.header.toString)
      .option("multiLine", cfg.delimiter.nonEmpty) // quoted newlines possible
      .option("encoding", cfg.charset)
      .option("mode", "PERMISSIVE")
      .option("enforceSchema", "true")
      // unquoted `\N` = NULL; empty field stays "" (reference csv_parser.go:
      // 78-89 + tests/csv/data empty_strings). Known deviation: a *quoted*
      // `"\N"` is also treated as NULL (univocity can't see quoting).
      .option("nullValue", if (cfg.notNull) "\u0001never\u0001" else cfg.nullRepr)
      .option("emptyValue", "")
    val widthAdd = if (cfg.trimLastSep) 1 else 0
    val schema = StructType((0 until ncols + widthAdd)
      .map(i => StructField(s"c$i", StringType, nullable = true)))
    val df0 =
      if (cfg.header) base.option("inferSchema", "false").csv(paths: _*)
      else base.schema(schema).csv(paths: _*)
    if (cfg.trimLastSep && !cfg.header) {
      // mydumper wrote `v1,v2,` — drop the phantom trailing column
      df0.drop(s"c$ncols")
    } else df0
  }

  /** Header names of one CSV file (driver-side peek via the univocity
    * reader — only the first record is materialized). */
  def headerNames(spark: SparkSession, path: String, cfg: CsvConfig,
      ncols: Int): Seq[String] =
    read(spark, Seq(path), cfg.copy(header = true), ncols).columns.toSeq

  private def resolveCharset(path: String, conf: org.apache.hadoop.conf.Configuration,
      cs: String): String =
    if (cs.equalsIgnoreCase("binary")) "ISO-8859-1"
    else if (!cs.equalsIgnoreCase("auto")) cs
    else {
      val p = new org.apache.hadoop.fs.Path(path)
      val in = p.getFileSystem(conf).open(p)
      try {
        val probe = new Array[Byte](64 * 1024)
        var off = 0; var n = 0
        while (off < probe.length &&
          { n = in.read(probe, off, probe.length - off); n > 0 }) off += n
        SqlDumpSource.detectCharset(java.util.Arrays.copyOf(probe, off))
      } finally in.close()
    }

  /** Splittable CSV read with a DETERMINISTIC per-file row handle: each
    * record carries (`src_file`, `row_off` = byte offset of its line) so
    * downstream row-id allocation is stable under any split plan, retries,
    * and `maxPartitionBytes` changes — unlike window-over-
    * `monotonically_increasing_id`, whose order is split-plan-dependent.
    *
    * Lines come from Hadoop TextInputFormat (byte-range splittable — a
    * 100 GiB file parses as ~400 tasks, not 1); fields are parsed per line
    * with `from_csv` (same univocity options as `read`). Requires records
    * without embedded newlines (`multiLine=false`); quoted newlines fall
    * back to `read`. Charsets decode per line — safe even for GB18030,
    * whose multibyte sequences never contain 0x0A. Output columns:
    * c0…cN first (same positional contract as `read`), then src_file,
    * row_off. */
  def readIndexed(spark: SparkSession, paths: Seq[String], cfg: CsvConfig,
      ncols: Int): DataFrame = {
    import org.apache.hadoop.io.{LongWritable, Text}
    import org.apache.hadoop.mapreduce.lib.input.TextInputFormat
    val sc = spark.sparkContext
    val sorted = paths.sorted
    val hconf = sc.hadoopConfiguration
    val charsets = sorted.map(p => p -> resolveCharset(p, hconf, cfg.charset)).toMap
    val fileRdds = sorted.map { path =>
      val cs = charsets(path)
      sc.newAPIHadoopFile(path, classOf[TextInputFormat],
          classOf[LongWritable], classOf[Text])
        .map { case (off, text) =>
          val bytes = java.util.Arrays.copyOf(text.getBytes, text.getLength)
          Row(path, off.get(), new String(bytes, cs))
        }
    }
    val lineSchema = StructType(Seq(
      StructField("src_file", StringType, nullable = false),
      StructField("row_off", LongType, nullable = false),
      StructField("_line", StringType, nullable = false)))
    val lines = spark.createDataFrame(sc.union(fileRdds), lineSchema)
      .filter(length(col("_line")) > 0) // univocity skips blank lines too
    val width = ncols + (if (cfg.trimLastSep) 1 else 0)
    val fschema = StructType((0 until width)
      .map(i => StructField(s"c$i", StringType, nullable = true)))
    val opts = Map(
      "sep" -> cfg.separator,
      "quote" -> (if (cfg.delimiter.isEmpty) "\u0000" else cfg.delimiter),
      "escape" -> (if (cfg.backslashEscape) "\\" else "\u0000"),
      "nullValue" -> (if (cfg.notNull) "\u0001never\u0001" else cfg.nullRepr),
      "emptyValue" -> "",
      "mode" -> "PERMISSIVE")
    val parsed = (if (cfg.header) lines.filter(col("row_off") > 0) else lines)
      .withColumn("_p", from_csv(col("_line"), fschema, opts))
    parsed.select((0 until ncols).map(i => col(s"_p.c$i").as(s"c$i")) ++
      Seq(col("src_file"), col("row_off")): _*)
  }
}
