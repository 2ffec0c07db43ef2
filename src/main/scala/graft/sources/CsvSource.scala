package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

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
    charset: String = "UTF-8")        // S7: also gb18030, binary→ISO-8859-1

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
}
