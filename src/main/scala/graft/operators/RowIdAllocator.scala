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
    * the same file differently). Decode failures (a literal `%` not
    * introducing a valid escape, e.g. `/data/100%done.sql`) keep the
    * original path — such a name was never percent-encoded to begin with. */
  private def normPath(p: String): String = {
    val decoded =
      try java.net.URLDecoder.decode(p, "UTF-8")
      catch { case _: IllegalArgumentException => p }
    decoded.replaceFirst("^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
  }

  /** Above this many files the per-chunk lookup switches from a
    * serialized-with-the-task hash table to a Spark-managed broadcast join
    * (torrent-broadcast once per executor, AQE-visible, spillable). */
  val BroadcastFallbackFiles = 10000

  /** @param fileSizes  every file of the TABLE — bases are global so
    *                   per-file ranges stay disjoint across chunk groups
    * @param restrictTo when this DataFrame only carries rows from a subset
    *                   of the table's files (a chunk-commit group), the
    *                   subset's paths — the lookup then holds only those
    *                   entries, bounded by `chunkCommitBytes` no matter how
    *                   large the table is (a 100 TB table is ~400k shards;
    *                   its groups are ~dozens of files each) */
  /** The (path → range base) assignment `fromFileSizes` uses, exposed so a
    * batched import can compute bases PER TABLE (each table's ids restart
    * independently, exactly as a standalone import would allocate) and then
    * resolve them all through one shared [[pathValue]] probe. */
  def fileBases(fileSizes: Seq[(String, Long)],
      capacityFor: Long => Long = sz => sz / 4 + 1): Seq[(String, Long)] =
    fileSizes.map { case (f, sz) => (f, normPath(f), sz) }
      .sortBy(_._2)
      .scanLeft(("", "", 0L)) { case ((_, _, acc), (f, n, sz)) =>
        (f, n, acc + capacityFor(sz)) }
      .sliding(2).collect { case Seq((_, _, base), (f, _, _)) => (f, base) }
      .toSeq

  def fromFileSizes(df: DataFrame, fileCol: String, idxCol: String,
      fileSizes: Seq[(String, Long)],
      rowIdCol: String = "_row_id",
      capacityFor: Long => Long = sz => sz / 4 + 1,
      restrictTo: Option[Seq[String]] = None,
      maxMapFiles: Int = BroadcastFallbackFiles): DataFrame = {
    val allBases = fileBases(fileSizes, capacityFor)
      .map { case (f, b) => (f, normPath(f), b) }
    val bases = restrictTo match {
      case Some(paths) =>
        val wanted = paths.map(normPath).toSet
        allBases.filter { case (_, n, _) => wanted(n) }
      case None => allBases
    }
    pathValue(df, fileCol, bases.map { case (f, _, b) => (f, b) },
        "__rid_base", maxMapFiles)
      .withColumn(rowIdCol, col("__rid_base") + col(idxCol) + 1)
      .drop("__rid_base")
  }

  /** Attach `outCol` = the Long value mapped from the row's source-file
    * path — the multi-rendering hash-probe (≤ `maxMapFiles` entries) /
    * broadcast-join (beyond) machinery documented below, factored out so
    * any per-file driver-computed value (row-id base, batch table ordinal)
    * rides the same O(1) probe. Unknown paths raise instead of silently
    * dropping rows. */
  def pathValue(df: DataFrame, fileCol: String, entries: Seq[(String, Long)],
      outCol: String, maxMapFiles: Int = BroadcastFallbackFiles): DataFrame = {
    val bases = entries.map { case (f, v) => (f, normPath(f), v) }
    // try_url_decode: a malformed rendering yields null (probes below are
    // null-safe → falls through to raise_error), where ANSI url_decode
    // would abort the whole import with CANNOT_DECODE_URL
    val normCol = regexp_replace(
      try_url_decode(col(fileCol)), "^[a-zA-Z][a-zA-Z0-9+.-]*:/+", "/")
    if (bases.size <= maxMapFiles) {
      // hash-probe lookup (StringMapLookup — one HashMap.get per row, one
      // plan node total): the fast table carries every rendering a source
      // might emit for the path (as-given, normalized, file:-URI forms), so
      // the common case is a single probe inside the codegen span; a row
      // whose rendering misses pays the url_decode+regex normalization and
      // probes the normalized table; a total miss raises instead of
      // silently dropping the row (the old inner join discarded unmatched
      // rows). Both probes return null on miss — NOT ANSI element_at,
      // which throws MAP_KEY_DOES_NOT_EXIST and would make the fallbacks
      // unreachable. A rendering claimed by two files with different bases
      // is ambiguous → dropped from the fast table (its rows resolve via
      // the normalized probe, or raise).
      val fastEntries = bases.flatMap { case (raw, n, base) =>
        val tail = n.stripPrefix("/")
        Seq(raw, n, s"file:$n", s"file://$n", s"file:///$tail")
          .distinct.map(k => (k, base))
      }.groupBy(_._1).collect {
        case (k, vs) if vs.map(_._2).distinct.size == 1 => (k, vs.head._2)
      }.toSeq
      val normEntries = bases.map { case (_, n, b) => (n, b) }
        .groupBy(_._1).collect {
          case (k, vs) if vs.map(_._2).distinct.size == 1 => (k, vs.head._2)
        }.toSeq
      import graft.functions.LookupExpressions.stringMapLookup
      df.withColumn(outCol, coalesce(
        stringMapLookup(col(fileCol), fastEntries),
        stringMapLookup(normCol, normEntries),
        raise_error(concat(lit("row-id base for unknown source file: "),
          col(fileCol))).cast("long")))
    } else {
      // beyond the threshold a task-serialized table would ship megabytes
      // with every stage — hand the lookup to Spark as a broadcast join on
      // the normalized rendering; LEFT join + explicit raise keeps the
      // raise-on-miss contract (an inner join would silently drop rows)
      val spark = df.sparkSession
      import spark.implicits._
      val baseDf = bases.map { case (_, n, b) => (n, b) }
        .toDF("__pv_key", "__pv_val")
      df.join(broadcast(baseDf), normCol === col("__pv_key"), "left")
        .withColumn(outCol,
          when(col("__pv_val").isNotNull, col("__pv_val"))
          .otherwise(raise_error(concat(
            lit("row-id base for unknown source file: "),
            col(fileCol))).cast("long")))
        .drop("__pv_key", "__pv_val")
    }
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

  /** P8 with the DDL floor: `CREATE TABLE ... AUTO_INCREMENT=N` pins the
    * rebase at N even when every imported id is below it (reference
    * tests/tidb_rowid pre_rebase: 1 row with rowid 1, next allocation must
    * land >= 70000 — tidb.go:241-257 takes the max of both). */
  def nextAutoIncrement(df: DataFrame, idCol: String,
      table: graft.sources.MysqlTable): Long =
    math.max(nextAutoIncrement(df, idCol), table.autoIncrementStart.getOrElse(1L))
}
