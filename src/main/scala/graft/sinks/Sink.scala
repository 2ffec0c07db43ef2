package graft.sinks

import org.apache.spark.sql.DataFrame

/** K1: the backend abstraction, Spark-shaped.
  *
  * The reference's `AbstractBackend` manages engine lifecycles
  * (open/write/close/import/cleanup — lightning/backend/backend.go:77-118)
  * because it must hand-schedule buffered writes; Spark's task commit
  * protocol already provides atomic, idempotent, retry-safe output, so the
  * surface shrinks to: write a DataFrame, report what was written.
  */
final case class WriteResult(table: String, rows: Long, outputPath: Option[String])

trait Sink {
  /** Write one table; must be idempotent under task retries (Spark commit
    * protocol for files; REPLACE/ON DUPLICATE semantics for SQL). */
  def write(df: DataFrame, db: String, table: String): WriteResult
}

/** Parquet (lakehouse) sink — the local/test default and the natural
  * "bulk files" analog of the importer backend's sorted SSTs.
  * Scale: `maxRecordsPerFile` bounds output file size the way the
  * reference's engine batcher bounds engines (region.go:64-133).
  *
  * Reports rows = -1 ("not counted"): the pipeline observes the row count
  * during the write itself (df.observe), so a count re-scan here would be
  * a pure extra pass. Set `recountRows` for a standalone use that wants
  * the sink to verify the written count. */
final class ParquetSink(rootDir: String,
    maxRecordsPerFile: Long = 5000000L,
    recountRows: Boolean = false) extends Sink {
  override def write(df: DataFrame, db: String, table: String): WriteResult = {
    val path = s"$rootDir/$db/$table"
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
    val rows =
      if (recountRows) df.sparkSession.read.parquet(path).count() else -1L
    WriteResult(s"$db.$table", rows, Some(path))
  }

  /** Bucketed write (the co-located-join output shape): Spark bucketing +
    * per-bucket sort on `bucketCols` via saveAsTable — every downstream
    * join/aggregate keyed on those columns reads the bucket layout from
    * the catalog and plans with NO exchange and NO sort. The price: one
    * transactional write per table (no chunk-staged appends — enforced by
    * the pipeline), and the table must live in the session catalog, since
    * plain `spark.read.parquet` cannot see bucket metadata. */
  def writeBucketed(df: DataFrame, db: String, table: String,
      buckets: Int, bucketCols: Seq[String]): WriteResult = {
    require(bucketCols.nonEmpty, "bucketBy needs at least one column")
    val path = s"$rootDir/$db/$table"
    val spark = df.sparkSession
    spark.sql(s"CREATE DATABASE IF NOT EXISTS `$db`")
    spark.sql(s"DROP TABLE IF EXISTS `$db`.`$table`")
    df.write.mode("overwrite")
      .option("path", path)
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(s"`$db`.`$table`")
    WriteResult(s"$db.$table", -1L, Some(path))
  }

  /** Chunk-granular write: append into the table directory (part-file
    * names are job-unique, so chunks never collide). Caller owns clearing
    * the directory on a fresh import. */
  def writeAppend(df: DataFrame, db: String, table: String): WriteResult = {
    val path = s"$rootDir/$db/$table"
    df.write.mode("append")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
    WriteResult(s"$db.$table", -1L, Some(path))
  }

  /** Staged chunk write for crash-consistent resume: the chunk's job writes
    * into a hidden `_staging_<tag>` subdir (invisible to parquet readers),
    * then the driver moves each part file into the table dir and returns
    * the moved names — the caller records them in the chunk's commit state.
    * A crash anywhere in between leaves either a hidden staging dir or
    * table-dir files referenced by no committed state; both are deleted by
    * the caller's resume reconciliation, so re-running the chunk cannot
    * duplicate rows. Moves are same-FS renames (metadata ops). */
  def writeChunkStaged(df: DataFrame, db: String, table: String,
      tag: String): Seq[String] = {
    val tableDir = new org.apache.hadoop.fs.Path(tablePath(db, table))
    val staging = new org.apache.hadoop.fs.Path(tableDir, s"_staging_$tag")
    val fs = tableDir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(staging)) fs.delete(staging, true) // stale crashed attempt
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(staging.toString)
    val parts = fs.listStatus(staging).toSeq
      .filter(st => st.isFile && st.getPath.getName.startsWith("part-"))
      .map(_.getPath)
    fs.mkdirs(tableDir)
    val moved = parts.map { p =>
      val dst = new org.apache.hadoop.fs.Path(tableDir, p.getName)
      // rename reports failure via its return value (existing destination,
      // cross-FS move) — committing the chunk state over a missing file
      // would silently lose rows AND skip the chunk on resume
      if (!fs.rename(p, dst))
        throw new java.io.IOException(s"staged-chunk rename failed: $p -> $dst")
      p.getName
    }
    fs.delete(staging, true)
    moved
  }

  def tablePath(db: String, table: String): String = s"$rootDir/$db/$table"
}
