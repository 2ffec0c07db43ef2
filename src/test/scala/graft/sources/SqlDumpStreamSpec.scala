package graft.sources

import java.io.File
import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

/** Streaming (continuous-import) face of the sqldump DSv2 source: new dump
  * files appearing in the directory become micro-batches; AvailableNow
  * catch-up runs resume from the checkpointed file offset and process only
  * the files added since. */
class SqlDumpStreamSpec extends SparkSpec {

  private def writeShard(dir: File, name: String, rows: Range): Unit =
    java.nio.file.Files.writeString(new File(dir, name).toPath,
      rows.map(i => s"INSERT INTO `t` VALUES ($i,'v$i');").mkString("", "\n", "\n"))

  test("readStream over a dump dir: incremental files, checkpointed resume") {
    val src = java.nio.file.Files.createTempDirectory("sds-src").toFile
    val out = java.nio.file.Files.createTempDirectory("sds-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("sds-ck").toString
    writeShard(src, "s.t.0001.sql", 1 to 40)
    writeShard(src, "s.t.0002.sql", 41 to 60)

    def runOnce(): Unit = {
      val stream = spark.readStream.format("sqldump")
        .load(src.getAbsolutePath)
        .selectExpr("src_file", "row_idx", "vals[0] AS id", "vals[1] AS v")
      val q = stream.writeStream
        .format("parquet")
        .option("checkpointLocation", ckpt)
        .option("path", out)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive)
    }

    runOnce()
    val first = spark.read.parquet(out)
    assert(first.count() === 60)
    assert(first.select("id").collect().map(_.getString(0).toInt).sorted.toSeq
      === (1 to 60))

    // a new shard appears; the catch-up run must process ONLY that file
    writeShard(src, "s.t.0003.sql", 61 to 75)
    runOnce()
    val second = spark.read.parquet(out)
    assert(second.count() === 75) // 60 + 15, no re-ingest of old shards
    assert(second.select("id").collect().map(_.getString(0).toInt).sorted.toSeq
      === (1 to 75))

    // no new files → a further run appends nothing
    runOnce()
    assert(spark.read.parquet(out).count() === 75)

    // a file that sorts BEFORE the committed ones appears: the persisted
    // discovery log pins committed positions, so the restart must ingest
    // exactly the new file — no duplicates of old shards, no skip
    writeShard(src, "s.t.0000.sql", 76 to 80)
    runOnce()
    val fourth = spark.read.parquet(out)
    assert(fourth.count() === 80)
    assert(fourth.select("id").collect().map(_.getString(0).toInt).sorted.toSeq
      === (1 to 80))

    // the log is written as versioned generations (temp + rename to a NEW
    // name — no delete-then-rename window that could leave no log at all);
    // superseded generations are pruned, so exactly one remains
    // (the DSv2 stream gets a per-source subdir of the checkpoint)
    import scala.jdk.CollectionConverters._
    def logFiles(): Seq[File] = java.nio.file.Files.walk(new File(ckpt).toPath)
      .iterator().asScala.map(_.toFile)
      .filter(_.getName.startsWith("graft_file_log")).toSeq
    val logs = logFiles()
    assert(logs.size === 1, s"expected one log generation, got $logs")
    assert(logs.head.getName.matches("graft_file_log\\.\\d+"))

    // a stray temp from a crashed swap must be ignored on restart: the
    // stream still resumes from the committed generation, no re-ingest
    java.nio.file.Files.writeString(
      new File(logs.head.getParentFile, ".graft_file_log.tmp").toPath, "bogus\n")
    writeShard(src, "s.t.0004.sql", 81 to 85)
    runOnce()
    assert(spark.read.parquet(out).count() === 85)
  }
}
