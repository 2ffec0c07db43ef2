package graft.streaming

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.functions.SketchExpressions
import graft.operators.Dedup

/** Continuous curation: documents arrive as a stream (a crawl landing in
  * object storage), the benchmark/eval set is FIXED — so decontamination
  * becomes a stateless per-batch filter: the eval corpus' distinct gram
  * universe rides to every executor once (literal/broadcast — benchmarks
  * are kilobytes, corpora are terabytes; at eval sets too big for a
  * literal the same plan becomes a stream-static left-semi join), and
  * each arriving document is flagged by one `arrays_overlap` against its
  * own kernel-hashed grams. No state store, no watermark, no shuffle —
  * the streaming twin of `Decontam.overlap`'s any-hit policy. */
object DocStream {

  /** Stream `docsDir` (parquet files) through the contamination flag into
    * a parquet sink (file sink + checkpoint = restart-safe: a re-run
    * processes only files the offset log has not seen); returns the full
    * flagged corpus accumulated in `outDir` after AvailableNow drains. */
  def decontamFlags(spark: SparkSession, docsDir: String, outDir: String,
      checkpointDir: String, evalGrams: Array[Long], n: Int): DataFrame = {
    val schema = spark.read.parquet(docsDir).schema
    val flagged = spark.readStream.schema(schema).parquet(docsDir)
      .filter(col("text").isNotNull)
      .select(col("doc_id"),
        arrays_overlap(
          SketchExpressions.gramHashes(Dedup.normalized(col("text")), n),
          lit(evalGrams)).cast("int").as("contaminated"))
    val q = flagged.writeStream
      .outputMode(OutputMode.Append())
      .format("parquet").option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(outDir)
  }

  /** Build (once, cached) a multi-file streaming fixture from a single
    * parquet table — the file-stream source consumes a directory. The
    * cache key is a CONTENT fingerprint of the source (paths + sizes +
    * mtimes), not just the path: a regenerated source parquet at the
    * same path gets a fresh fixture dir instead of silently replaying
    * the stale one (which would diverge from the batch oracle). */
  def ensureStreamFixture(spark: SparkSession, srcParquet: String,
      root: File): File = {
    val src = new File(srcParquet)
    val parts: Seq[File] =
      if (src.isDirectory)
        Option(src.listFiles()).getOrElse(Array.empty[File])
          .filter(f => f.isFile && !f.getName.startsWith(".")).toSeq
          .sortBy(_.getName)
      else Seq(src)
    val fp = graft.functions.Crc64.checksum(parts
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .mkString("|").getBytes("UTF-8"))
    val dir = new File(root, f"docs_${math.abs(srcParquet.hashCode)}_$fp%016x")
    if (!new File(dir, "_SUCCESS").exists()) {
      spark.read.parquet(srcParquet).coalesce(4)
        .write.mode("overwrite").parquet(dir.getAbsolutePath)
    }
    dir
  }
}
