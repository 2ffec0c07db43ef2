package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import scala.jdk.CollectionConverters._

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
      // null handling happens POST-parse (nullFix): Spark's CSV reader maps
      // a missing/unquoted-empty field to NULL, but the reference keeps it
      // as '' unless the configured null token is itself '' (csv_parser.go:
      // 50-61 appendEmptyValues + tests/csv/data empty_strings) — so the
      // reader runs with an unmatchable nullValue and the token compare
      // runs as a column expression afterwards.
      .option("nullValue", "\u0001never\u0001")
      .option("emptyValue", "")
    val widthAdd = if (cfg.trimLastSep) 1 else 0
    val schema = StructType((0 until ncols + widthAdd)
      .map(i => StructField(s"c$i", StringType, nullable = true)))
    val df0 =
      if (cfg.header) base.option("inferSchema", "false").csv(paths: _*)
      else base.schema(schema).csv(paths: _*)
    val df1 =
      if (cfg.trimLastSep && !cfg.header) {
        // mydumper wrote `v1,v2,` — drop the phantom trailing column
        df0.drop(s"c$ncols")
      } else df0
    df1.select(df1.columns.map(n => nullFix(col(n), cfg).as(n)): _*)
  }

  /** Reference null semantics as a post-parse expression: the null token
    * (`\N` by default) → NULL; a missing/empty field → '' (NULL only when
    * the configured token IS '' — reference appendEmptyValues,
    * csv_parser.go:50-61 + tests/csv/data empty_strings). Known deviation:
    * a *quoted* `"\N"` is also treated as NULL (univocity can't see
    * quoting at this point). */
  private def nullFix(c: org.apache.spark.sql.Column,
      cfg: CsvConfig): org.apache.spark.sql.Column =
    if (cfg.notNull) coalesce(c, lit(""))
    else when(coalesce(c, lit("")) === cfg.nullRepr,
      lit(null).cast(StringType)).otherwise(coalesce(c, lit("")))

  /** Header names of one CSV file: a direct driver-side read of the first
    * line (charset-resolved), parsed with the same univocity format. NOT a
    * `spark.read.csv` — that constructs a DataFrame (schema inference job)
    * per file, which at a 10k-shard dump turns header discovery into 10k
    * driver jobs; this is one small FS open per file. */
  def headerNames(spark: SparkSession, path: String, cfg: CsvConfig,
      ncols: Int): Seq[String] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val cs = resolveCharset(path, conf, cfg.charset)
    val p = new org.apache.hadoop.fs.Path(path)
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(
      p.getFileSystem(conf).open(p), java.nio.charset.Charset.forName(cs)))
    try {
      val line = in.readLine()
      require(line != null, s"empty CSV file with header=true: $path")
      val settings = new com.univocity.parsers.csv.CsvParserSettings
      settings.getFormat.setDelimiter(cfg.separator.charAt(0))
      settings.getFormat.setQuote(
        if (cfg.delimiter.isEmpty) 0.toChar else cfg.delimiter.charAt(0))
      settings.getFormat.setQuoteEscape(
        if (cfg.backslashEscape) '\\' else 0.toChar)
      settings.setMaxCharsPerColumn(-1)
      val parser = new com.univocity.parsers.csv.CsvParser(settings)
      Option(parser.parseLine(line)).getOrElse(Array.empty[String])
        .toSeq.map(v => if (v == null) "" else v)
    } finally in.close()
  }

  private[sources] def resolveCharset(path: String,
      conf: org.apache.hadoop.conf.Configuration, cs: String): String =
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

  /** Whole-file CSV read for the quoted-newline quirk (`multiLine`): one
    * task per file (the format is non-splittable then anyway), parsing
    * with univocity directly so every record carries a DENSE, deterministic
    * (src_file, row_idx) — no window, no `monotonically_increasing_id`.
    * Output columns: c0…cN, then src_file, row_idx (same contract as
    * `readIndexed`). Null semantics mirror `read`: `nullRepr` → NULL,
    * empty field → '' (quoted `"\N"` is also NULL — same pinned univocity
    * deviation). */
  def readWholeFileIndexed(spark: SparkSession, paths: Seq[String],
      cfg: CsvConfig, ncols: Int): DataFrame = {
    val sorted = paths.sorted
    val sc = spark.sparkContext
    val confEntries = sc.broadcast(
      sc.hadoopConfiguration.iterator().asScala
        .map(e => (e.getKey, e.getValue)).toSeq)
    val width = ncols + (if (cfg.trimLastSep) 1 else 0)
    val c = cfg
    val rdd = sc.parallelize(sorted, math.max(1, sorted.size)).flatMap { path =>
      val conf = new org.apache.hadoop.conf.Configuration(false)
      confEntries.value.foreach { case (k, v) => conf.set(k, v) }
      val cs = resolveCharset(path, conf, c.charset)
      val settings = new com.univocity.parsers.csv.CsvParserSettings
      settings.getFormat.setDelimiter(c.separator.charAt(0))
      settings.getFormat.setQuote(
        if (c.delimiter.isEmpty) '\u0000' else c.delimiter.charAt(0))
      settings.getFormat.setQuoteEscape(
        if (c.backslashEscape) '\\' else '\u0000')
      settings.setNullValue("")       // unquoted empty → '' (emptyValue)
      settings.setEmptyValue("")      // quoted empty → ''
      settings.setHeaderExtractionEnabled(c.header)
      settings.setMaxColumns(math.max(16, width + 4))
      settings.setMaxCharsPerColumn(-1)
      settings.setLineSeparatorDetectionEnabled(true)
      val parser = new com.univocity.parsers.csv.CsvParser(settings)
      val p = new org.apache.hadoop.fs.Path(path)
      val in = new java.io.InputStreamReader(
        p.getFileSystem(conf).open(p), java.nio.charset.Charset.forName(cs))
      val it = parser.iterate(in).iterator()
      new Iterator[Row] {
        private var idx = 0L
        override def hasNext: Boolean = it.hasNext
        override def next(): Row = {
          val rec = it.next()
          val vals = (0 until ncols).map { i =>
            val v = if (i < rec.length) rec(i) else null
            if (v == null) "" // absent trailing fields → ''
            else if (!c.notNull && v == c.nullRepr) null
            else v
          }
          val r = Row.fromSeq(vals :+ path :+ idx)
          idx += 1
          r
        }
      }
    }
    val schema = StructType(
      (0 until ncols).map(i => StructField(s"c$i", StringType, nullable = true)) ++
        Seq(StructField("src_file", StringType, nullable = false),
          StructField("row_idx", LongType, nullable = false)))
    spark.createDataFrame(rdd, schema)
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
      "nullValue" -> "\u0001never\u0001", // null token handled by nullFix
      "emptyValue" -> "",
      "mode" -> "PERMISSIVE")
    val parsed = (if (cfg.header) lines.filter(col("row_off") > 0) else lines)
      .withColumn("_p", from_csv(col("_line"), fschema, opts))
    parsed.select((0 until ncols).map(i =>
        nullFix(col(s"_p.c$i"), cfg).as(s"c$i")) ++
      Seq(col("src_file"), col("row_off")): _*)
  }
}
