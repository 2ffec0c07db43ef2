package graft.sources

import java.io.File
import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Export

/** Laws of the BATCH `format("graftlake")` relation: read/write through
  * the plain format API, version/timestamp time travel, filter pushdown
  * into the parquet scan, manifest-tag FILE pruning behind pushed
  * literal conjuncts, and the honesty gates (column-mapped / DV-bearing
  * heads refused, never served wrong). */
class GraftLakeBatchSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): File =
    Files.createTempDirectory(prefix).toFile

  private def rows(lo: Int, hi: Int): DataFrame =
    (lo until hi).map(i => (i.toLong, s"d$i", (i % 3).toString))
      .toDF("id", "s", "m")

  test("write then read via the format API: modes map to commit kinds, time travel via versionAsOf/timestampAsOf") {
    val t = tmp("glb-rt").getAbsolutePath
    rows(0, 5).write.format("graftlake").save(t) // first write appends
    rows(5, 8).write.format("graftlake").mode("append").save(t)
    assert(Export.snapshotVersions(t) === Seq(1, 2))
    assert(Export.snapshotOperation(t, 2) === Some("append"))
    val got = spark.read.format("graftlake").load(t)
      .select("id").as[Long].collect().sorted
    assert(got.toSeq === (0L until 8L))
    // versionAsOf
    assert(spark.read.format("graftlake").option("versionAsOf", "1")
      .load(t).count() === 5)
    // timestampAsOf resolves to the newest commit at or before
    val ts1 = Export.snapshotTimestamp(t, 1)
    assert(spark.read.format("graftlake")
      .option("timestampAsOf", ts1.toString)
      .load(t).count() === 5)
    // overwrite = full-replace VERSION; old state still time-travels
    rows(100, 102).write.format("graftlake").mode("overwrite").save(t)
    assert(Export.snapshotOperation(t, 3) === Some("replace"))
    assert(spark.read.format("graftlake").load(t).count() === 2)
    assert(spark.read.format("graftlake").option("versionAsOf", "2")
      .load(t).count() === 8)
    // errorIfExists / ignore
    intercept[IllegalStateException](
      rows(0, 1).write.format("graftlake").mode("errorifexists").save(t))
    rows(0, 1).write.format("graftlake").mode("ignore").save(t)
    assert(Export.latestSnapshotVersion(t) === 3)
  }

  test("pushed filters reach the parquet scan (PushedFilters) and the manifest stats prune FILES at planning time") {
    val t = tmp("glb-prune").getAbsolutePath
    val df = (0 until 400).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    Export.appendSnapshotStatted(spark, df, t, statCols = Seq("id"),
      nFiles = 8)
    val q = spark.read.format("graftlake").load(t)
      .filter(col("id") >= 300L && col("id") <= 340L)
    // correctness first
    assert(q.select("id").as[Long].collect().sorted.toSeq ===
      (300L to 340L))
    // pushdown proof: the physical plan's scan carries the id filters
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(id,300)"), plan.take(2000))
    // file-pruning proof: the scan reads fewer files than the manifest
    // lists (the 8 range-clustered files cover disjoint id ranges)
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .flatMap(_.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.relation.location.listFiles(Nil,
            f.dataFilters).map(_.files.size).sum
      }).sum
    val total = Export.snapshotFiles(t, 1).size
    assert(total === 8)
    assert(scanned <= 2, s"expected <=2 of $total files planned, " +
      s"got $scanned")
  }

  test("partition option lays out + p=-tags the epoch; equality conjuncts prune files from the manifest") {
    val t = tmp("glb-part").getAbsolutePath
    rows(0, 30).write.format("graftlake")
      .option("partitionBy", "m").save(t)
    val files = Export.snapshotFiles(t, 1)
    assert(files.exists(_.contains("_p_m=0")) &&
      files.exists(_.contains("_p_m=2")))
    val q = spark.read.format("graftlake").load(t)
      .filter(col("m") === "1")
    assert(q.select("id").as[Long].collect().sorted.toSeq ===
      (0L until 30L).filter(_ % 3 == 1))
    val index = new GraftLakeFileIndex(spark, t, 1,
      Export.snapshotSchema(t, 1).get)
    val pruned = index.listFiles(Nil, Seq(
      org.apache.spark.sql.catalyst.expressions.EqualTo(
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "m", org.apache.spark.sql.types.StringType)(),
        org.apache.spark.sql.catalyst.expressions.Literal("1"))))
      .map(_.files.size).sum
    assert(pruned < files.size, s"pruned=$pruned of ${files.size}")
    // and a conjunct on an untagged column prunes nothing (never wrong)
    val open = index.listFiles(Nil, Seq(
      org.apache.spark.sql.catalyst.expressions.EqualTo(
        org.apache.spark.sql.catalyst.expressions.AttributeReference(
          "s", org.apache.spark.sql.types.StringType)(),
        org.apache.spark.sql.catalyst.expressions.Literal("d1"))))
      .map(_.files.size).sum
    assert(open === files.size)
  }

  test("honesty gates: column-mapped and DV-bearing heads are refused with a pointer, old clean versions still readable") {
    val t = tmp("glb-gates").getAbsolutePath
    rows(0, 6).write.format("graftlake").save(t)
    // DV-bearing head
    Export.deleteWhereMoR(spark, t, col("id") < 2)
    val e1 = intercept[IllegalArgumentException](
      spark.read.format("graftlake").load(t).collect())
    assert(e1.getMessage.contains("deletion vectors"))
    // the pre-delete version stays servable
    assert(spark.read.format("graftlake").option("versionAsOf", "1")
      .load(t).count() === 6)
    // compaction materializes the DVs -> format API serves again
    Export.compactSnapshot(spark, t)
    assert(spark.read.format("graftlake").load(t)
      .select("id").as[Long].collect().sorted.toSeq === (2L until 6L))
    // column-mapped head
    Export.renameSnapshotColumn(t, "s", "label")
    val e2 = intercept[IllegalArgumentException](
      spark.read.format("graftlake").load(t).collect())
    assert(e2.getMessage.contains("column mapping"))
  }

  test("batch write interleaves with the streaming sink's exactly-once guard (append commits carry no batch header but never reset it)") {
    val t = tmp("glb-mix")
    val s = new GraftLakeSink(spark,
      Map("path" -> t.getAbsolutePath), Seq.empty,
      org.apache.spark.sql.streaming.OutputMode.Append())
    s.addBatch(0, rows(0, 2))
    rows(2, 4).write.format("graftlake").mode("append")
      .save(t.getAbsolutePath)
    s.addBatch(0, rows(50, 52)) // replay refused across the batch write
    assert(Export.lastAppliedBatch(t.getAbsolutePath) === 0L)
    assert(spark.read.format("graftlake").load(t.getAbsolutePath)
      .select("id").as[Long].collect().sorted.toSeq === (0L until 4L))
  }
}
