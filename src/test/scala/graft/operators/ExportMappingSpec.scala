package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** COLUMN MAPPING laws: RENAME/DROP COLUMN are single manifest commits
  * that never rewrite or alias data bytes — physical names are
  * assigned once, renames move only the logical name, drops retire the
  * physical name forever, and every reader/writer in the funnel agrees
  * on the mapping. */
class ExportMappingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft-colmap").toFile.getAbsolutePath

  private def rows(lo: Int, hi: Int): DataFrame =
    (lo until hi).map(i => (i.toLong, s"d$i", i % 3)).toDF("id", "s", "m")

  test("rename is METADATA-ONLY: same data files, new logical name, " +
      "old values; time travel keeps the old name; op stamped") {
    val t = tmp()
    Export.appendSnapshot(spark, rows(0, 5), t)
    val before = Export.snapshotFiles(t, 1)
    val v = Export.renameSnapshotColumn(t, "s", "label")
    assert(v === 2)
    assert(Export.snapshotFiles(t, 2) === before, "no data rewrite")
    assert(Export.snapshotOperation(t, 2) === Some("rename"))
    val now = Export.readSnapshot(spark, t, 2)
    assert(now.columns.toSeq === Seq("id", "label", "m"))
    assert(now.select("id", "label").as[(Long, String)].collect()
      .sortBy(_._1).toSeq === (0 until 5).map(i => (i.toLong, s"d$i")))
    val old = Export.readSnapshot(spark, t, 1)
    assert(old.columns.toSeq === Seq("id", "s", "m"),
      "pre-rename versions time-travel under their own names")
  }

  test("appends after a rename use the new logical name; reads, " +
      "compaction and chained renames stay consistent") {
    val t = tmp()
    Export.appendSnapshot(spark, rows(0, 3), t)
    Export.renameSnapshotColumn(t, "s", "label")
    Export.appendSnapshot(spark,
      (3 until 6).map(i => (i.toLong, s"d$i", i % 3))
        .toDF("id", "label", "m"), t)
    def ids(df: DataFrame) =
      df.select("id", "label").as[(Long, String)].collect()
        .sortBy(_._1).toSeq
    val want = (0 until 6).map(i => (i.toLong, s"d$i"))
    assert(ids(Export.readSnapshot(spark, t,
      Export.latestSnapshotVersion(t))) === want,
      "old epochs (physical name) and new epochs decode to one table")
    Export.compactSnapshot(spark, t)
    assert(ids(Export.readSnapshot(spark, t,
      Export.latestSnapshotVersion(t))) === want,
      "compaction of a renamed table preserves rows")
    Export.renameSnapshotColumn(t, "label", "title")
    val twice = Export.readSnapshot(spark, t,
      Export.latestSnapshotVersion(t))
    assert(twice.columns.toSeq === Seq("id", "title", "m"))
    assert(twice.select("id", "title").as[(Long, String)].collect()
      .sortBy(_._1).toSeq === want, "renames chain")
  }

  test("rename refusals: live logical, live physical, retired name, " +
      "tag-keyed column") {
    val t = tmp()
    Export.appendSnapshot(spark, rows(0, 4), t)
    Export.renameSnapshotColumn(t, "s", "label")
    intercept[IllegalArgumentException](
      Export.renameSnapshotColumn(t, "m", "label"))
    intercept[IllegalArgumentException](
      Export.renameSnapshotColumn(t, "m", "s")) // s is label's physical
    Export.dropSnapshotColumn(t, "m")
    intercept[IllegalArgumentException](
      Export.renameSnapshotColumn(t, "label", "m")) // m retired
    val t2 = tmp()
    Export.appendSnapshotStatted(spark, rows(0, 4), t2,
      statCols = Seq("id"), nFiles = 2)
    intercept[IllegalArgumentException](
      Export.renameSnapshotColumn(t2, "id", "key")) // s= tag keys on id
  }

  test("drop is metadata-only and the retired physical name NEVER " +
      "resurfaces: a re-added column is null for old rows") {
    val t = tmp()
    Export.appendSnapshot(spark, rows(0, 3), t)
    val before = Export.snapshotFiles(t, 1)
    val v = Export.dropSnapshotColumn(t, "s")
    assert(Export.snapshotFiles(t, v) === before, "no data rewrite")
    val now = Export.readSnapshot(spark, t, v)
    assert(now.columns.toSeq === Seq("id", "m"))
    assert(Export.readSnapshot(spark, t, 1).columns.contains("s"),
      "pre-drop versions still carry the column")
    // re-add the SAME logical name: old bytes must stay invisible
    Export.appendSnapshotEvolved(spark,
      (3 until 5).map(i => (i.toLong, i % 3, s"NEW$i"))
        .toDF("id", "m", "s"), t)
    val got = Export.readSnapshot(spark, t,
        Export.latestSnapshotVersion(t))
      .select("id", "s").as[(Long, Option[String])].collect()
      .sortBy(_._1).toSeq
    assert(got === Seq((0L, None), (1L, None), (2L, None),
      (3L, Some("NEW3")), (4L, Some("NEW4"))),
      "dropped bytes resurfaced" )
  }

  test("diffs align versions by PHYSICAL identity: a rename commit is " +
      "an EMPTY change feed, and changes across a rename emit under " +
      "the NEW names") {
    val t = tmp()
    Export.appendSnapshot(spark, rows(0, 4), t)
    val v2 = Export.renameSnapshotColumn(t, "s", "label")
    assert(Export.snapshotDiff(spark, t, 1, v2).count() === 0L,
      "a rename changes labels, not bytes")
    val v3 = Export.deleteWhere(spark, t, col("m") === 0)
    val d = Export.snapshotDiff(spark, t, 1, v3)
    assert(d.columns.toSeq === Seq("id", "label", "m", "_change"))
    assert(d.select("id", "_change").as[(Long, String)].collect()
      .sortBy(_._1).toSeq === Seq((0L, "delete"), (3L, "delete")))
    val k = Export.snapshotDiffKeyed(spark, t, 1, v3, Seq("id"))
    assert(k.filter(col("_change") === "delete").select("id")
      .as[Long].collect().sorted.toSeq === Seq(0L, 3L))
  }

  test("DML on a renamed table: CoW delete and MoR delete evaluate " +
      "predicates on the NEW logical name") {
    val t = tmp()
    Export.appendSnapshot(spark, rows(0, 6), t)
    Export.renameSnapshotColumn(t, "m", "bucket")
    Export.deleteWhere(spark, t, col("bucket") === 0)
    def ids(v: Int) = Export.readSnapshot(spark, t, v)
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids(Export.latestSnapshotVersion(t)) ===
      (0L until 6L).filterNot(_ % 3 == 0))
    Export.deleteWhereMoR(spark, t, col("bucket") === 1)
    assert(ids(Export.latestSnapshotVersion(t)) ===
      (0L until 6L).filter(_ % 3 == 2))
  }

  test("layout writers REFUSE mapped key columns with a clear error; " +
      "unmapped keys still work on a renamed table") {
    val t = tmp()
    Export.appendSnapshot(spark, rows(0, 4), t)
    Export.renameSnapshotColumn(t, "s", "label")
    val more = (4 until 8).map(i => (i.toLong, s"d$i", i % 3))
      .toDF("id", "label", "m")
    val ex = intercept[IllegalArgumentException](
      Export.appendSnapshotStatted(spark, more, t,
        statCols = Seq("label"), nFiles = 1))
    assert(ex.getMessage.contains("physical name differs"))
    // keys whose physical == logical are unaffected by the table's map
    Export.appendSnapshotClustered(spark, more, t, keyCol = "id",
      nFiles = 2)
    assert(Export.readSnapshot(spark, t, Export.latestSnapshotVersion(t))
      .count() === 8)
  }
}
