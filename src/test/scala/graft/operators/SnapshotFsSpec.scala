package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** A local filesystem surfaced under a NON-`file:` scheme: any
  * `java.io.File`/`java.nio.file` call on a `mockfs:/...` path fails
  * (no such OS path), so a green run through this scheme proves the
  * snapshot/manifest/vacuum layer really resolves
  * `org.apache.hadoop.fs.FileSystem` from the table URI — the property
  * that makes the lake layer deployable on HDFS/S3A at the 100 TB design
  * point, where driver-local file I/O simply cannot run. */
class MockFs extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("mockfs:///")
  override def getScheme: String = "mockfs"
}

class SnapshotFsSpec extends SparkSpec {
  import spark.implicits._

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRec)
    f.delete()
  }

  private def mockRoot(name: String): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.mockfs.impl", classOf[MockFs].getName)
    val local = new java.io.File("target/qtmp_mockfs", name)
    deleteRec(local)
    s"mockfs:${local.getAbsolutePath}"
  }

  test("snapshot log runs end-to-end on a non-file: scheme (no java.io.File on the manifest path)") {
    val out = mockRoot("snap")
    val a = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val b = Seq((3L, "c")).toDF("id", "s")
    val v1 = Export.appendSnapshot(spark, a, out)
    val v2 = Export.appendSnapshot(spark, b, out)
    assert((v1, v2) === ((1, 2)))
    assert(Export.latestSnapshotVersion(out) === 2)
    // time travel: v1 readable after v2's commit, both exact
    assert(Export.readSnapshot(spark, out, 1).collect().map(_.getLong(0))
      .sorted.toSeq === Seq(1L, 2L))
    assert(Export.readSnapshot(spark, out, 2).collect().map(_.getLong(0))
      .sorted.toSeq === Seq(1L, 2L, 3L))
    // manifests hold qualified mockfs: URIs, not bare local paths
    val meta = Export.snapshotMeta(out, 2)
    assert(meta.isEmpty)
  }

  test("concurrent commit: the losing committer fails loudly, the winner's manifest is untouched") {
    val out = mockRoot("snap_race")
    val v1 = Export.replaceSnapshot(spark, Seq((1L, "a")).toDF("id", "s"), out)
    assert(v1 === 1)
    // interleave the race at the commit point: both committers listed the
    // log, both chose version 2, the other renamed _v2 into place first
    val local = new java.io.File(out.stripPrefix("mockfs:"))
    java.nio.file.Files.writeString(
      new java.io.File(local, "_v2.manifest").toPath, "#batch=99")
    val (fs, root) = Export.fsRoot(out)
    intercept[IllegalStateException] {
      Export.commitManifest(fs, root, 2, Map("batch" -> "100"),
        Seq("mockfs:/nonexistent/loser.parquet"))
    }
    // the winner's manifest is untouched; the loser left no temp litter
    assert(Export.snapshotMeta(out, 2) === Map("batch" -> "99"))
    assert(!local.listFiles().exists(_.getName.startsWith("_tmp._v")),
      "losing committer leaked its temp manifest")
    assert(Export.latestSnapshotVersion(out) === 2)
  }

  test("replace + meta headers + vacuum through the non-file: scheme") {
    val out = mockRoot("snap_replace")
    val v1 = Export.replaceSnapshot(spark, Seq((1L, 10L)).toDF("k", "v"),
      out, meta = Map("batch" -> "0"))
    val v2 = Export.replaceSnapshot(spark, Seq((1L, 11L), (2L, 20L)).toDF("k", "v"),
      out, meta = Map("batch" -> "1"))
    assert(Export.snapshotMeta(out, v1) === Map("batch" -> "0"))
    assert(Export.snapshotMeta(out, v2) === Map("batch" -> "1"))
    val (droppedV, deletedF) = Export.vacuumSnapshots(out, keep = 1,
      horizonMs = 0)
    assert(droppedV === 1 && deletedF >= 1)
    // survivor intact and byte-identical through the mock scheme
    assert(Export.readSnapshot(spark, out, v2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq ===
      Seq((1L, 11L), (2L, 20L)))
    // dropped version really gone
    intercept[java.io.FileNotFoundException] {
      Export.readSnapshot(spark, out, v1).collect()
    }
  }
}
