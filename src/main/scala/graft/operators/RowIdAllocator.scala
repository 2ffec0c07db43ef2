package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** P4/S8: deterministic, contiguous row-id allocation.
  *
  * The reference pre-allocates a disjoint row-id range per file chunk
  * (estimate at lightning/mydump/region.go:135-176, exact rebase at
  * lightning/backend/allocator.go:40-57). Here the ranges are *exact*: one
  * cheap count per file (driver-side, metadata-cheap for columnar inputs,
  * one scan worst-case) gives cumulative base offsets in deterministic file
  * order; within a file, `row_number()` over the file partition adds the
  * local index.
  *
  * Scale: the window partitions by file — parallelism = number of files,
  * the same unit the reference uses. Never `monotonically_increasing_id`
  * (not stable under retries / repartitioning).
  */
object RowIdAllocator {

  /** Add `rowIdCol` (1-based, contiguous across files in lexicographic file
    * order) to a DataFrame carrying (fileCol, idxCol) from a parser that
    * numbered rows within each file. Avoids the window entirely — pure
    * projection + one tiny broadcast join. */
  def fromFileIndex(df: DataFrame, fileCol: String, idxCol: String,
                    rowIdCol: String = "_row_id"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.groupBy(col(fileCol)).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val bases = counts.scanLeft(("", 0L)) { case ((_, acc), (f, n)) => (f, acc + n) }
      .sliding(2).collect { case Array((_, base), (f, _)) => (f, base) }.toSeq
    val baseDf = bases.toDF(fileCol + "__f", "__base")
    df.join(broadcast(baseDf), col(fileCol) === col(fileCol + "__f"))
      .withColumn(rowIdCol, col("__base") + col(idxCol) + 1)
      .drop(fileCol + "__f", "__base")
  }

  /** S8-style estimated allocation: disjoint, increasing per-file ranges
    * computed from file *sizes* (driver-side, no counting pass) — the
    * reference's RowIDMax estimate (region.go:135-176). Row-ids may have
    * gaps between files (TiDB semantics allow gaps; the final value is set
    * by the post-import rebase, P8); within a file they are exact.
    * `capacityFor` must upper-bound rows-per-byte (default: 1 row per 4
    * bytes — `(x),` is the smallest possible tuple). */
  /** Scheme/encoding-insensitive path form: `file:///a`, `file:/a` and
    * `/a` all compare equal (input_file_name() and Hadoop listings render
    * the same file differently). */
  private def normPath(p: String): String = {
    val decoded = java.net.URLDecoder.decode(p, "UTF-8")
    decoded.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
  }

  def fromFileSizes(df: DataFrame, fileCol: String, idxCol: String,
      fileSizes: Seq[(String, Long)],
      rowIdCol: String = "_row_id",
      capacityFor: Long => Long = sz => sz / 4 + 1): DataFrame = {
    val bases = fileSizes.map { case (f, sz) => (f, normPath(f), sz) }
      .sortBy(_._2)
      .scanLeft(("", "", 0L)) { case ((_, _, acc), (f, n, sz)) =>
        (f, n, acc + capacityFor(sz)) }
      .sliding(2).collect { case Seq((_, _, base), (f, n, _)) => (f, n, base) }
      .toSeq
    // literal-map lookup instead of a broadcast join + per-row regex: the
    // fast map carries every rendering a source might emit for the path
    // (as-given, normalized, file:-URI forms), so the common case is one
    // string-hash probe inside the codegen span; only a row whose rendering
    // misses pays the url_decode+regex normalization, and a total miss
    // raises instead of silently dropping the row (the old inner join
    // discarded unmatched rows).
    val fastEntries = bases.flatMap { case (raw, n, base) =>
      val tail = n.stripPrefix("/")
      Seq(raw, n, s"file:$n", s"file://$n", s"file:///$tail")
        .distinct.map(k => (k, base))
    }.distinct
    val fastMap = map(fastEntries.flatMap { case (k, b) =>
      Seq(lit(k), lit(b)) }: _*)
    val normMap = map(bases.flatMap { case (_, n, b) =>
      Seq(lit(n), lit(b)) }: _*)
    val normCol = regexp_replace(
      url_decode(col(fileCol)), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
    val base = coalesce(
      element_at(fastMap, col(fileCol)),
      element_at(normMap, normCol),
      raise_error(concat(lit("row-id base for unknown source file: "),
        col(fileCol))).cast("long"))
    df.withColumn(rowIdCol, base + col(idxCol) + 1)
  }

  /** Same, but for sources with no per-file row index (CSV): row_number()
    * within the file partition ordered by a stable in-file column. */
  def fromOrdering(df: DataFrame, fileCol: Column, orderCol: Column,
                   rowIdCol: String = "_row_id"): DataFrame = {
    val w = Window.partitionBy(fileCol).orderBy(orderCol)
    val withIdx = df.withColumn("__idx", row_number().over(w) - 1)
      .withColumn("__file", fileCol)
    fromFileIndex(withIdx, "__file", "__idx", rowIdCol)
      .drop("__idx", "__file")
  }

  /** P8 analog: next auto-increment value after the import
    * (`ALTER TABLE t AUTO_INCREMENT = max(id)+1` — reference
    * lightning/restore/tidb.go:241-257). */
  def nextAutoIncrement(df: DataFrame, idCol: String): Long =
    df.agg(max(col(idCol).cast("long"))).collect()(0) match {
      case r if r.isNullAt(0) => 1L
      case r => r.getLong(0) + 1L
    }
}
