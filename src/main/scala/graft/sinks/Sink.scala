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

  def tablePath(db: String, table: String): String = s"$rootDir/$db/$table"
}
