package graft.sources

import java.io.File
import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Export

/** The SQL catalog over lake tables: name-addressed CREATE/INSERT/
  * SELECT/OVERWRITE/DROP from plain SQL, resolving through the v1
  * fallback into the manifest-planned relation — and full composition
  * with the path-addressed surface (TVFs, DML procedures) because a
  * catalog table IS its snapshot-log directory. */
class GraftLakeCatalogSpec extends SparkSpec {
  import spark.implicits._

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("glc-warehouse").toFile
    spark.conf.set("spark.sql.catalog.glc",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.glc.warehouse", w.getAbsolutePath)
    w.getAbsolutePath
  }

  test("CREATE NAMESPACE / CREATE TABLE / INSERT INTO / SELECT / INSERT OVERWRITE / DROP, all by name from SQL") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE glc.corpus")
    spark.sql("CREATE TABLE glc.corpus.docs (doc_id BIGINT, n BIGINT)")
    // the catalog table IS a snapshot log at <warehouse>/corpus/docs
    assert(Export.latestSnapshotVersion(s"$wh/corpus/docs") === 1)
    spark.sql(
      "INSERT INTO glc.corpus.docs SELECT id, id * 10 FROM range(5)")
    spark.sql(
      "INSERT INTO glc.corpus.docs SELECT id, id * 10 FROM range(5, 8)")
    val got = spark.sql(
        "SELECT doc_id, n FROM glc.corpus.docs ORDER BY doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === (0L until 8L).map(i => (i, i * 10)))
    // predicate pushdown reaches the parquet scan through the fallback
    val q = spark.sql("SELECT n FROM glc.corpus.docs WHERE doc_id = 6")
    assert(q.collect().map(_.getLong(0)).toSeq === Seq(60L))
    assert(q.queryExecution.executedPlan.toString.contains("PushedFilters"))
    // INSERT OVERWRITE = full-replace VERSION; prior state time-travels
    spark.sql(
      "INSERT OVERWRITE glc.corpus.docs SELECT id, id FROM range(3)")
    assert(spark.sql("SELECT count(*) FROM glc.corpus.docs")
      .collect().head.getLong(0) === 3)
    assert(Export.snapshotOperation(s"$wh/corpus/docs",
      Export.latestSnapshotVersion(s"$wh/corpus/docs")) ===
      Some("replace"))
    assert(Export.readSnapshot(spark, s"$wh/corpus/docs", 3).count() === 8)
    // SHOW TABLES sees it; DROP removes it
    val listed = spark.sql("SHOW TABLES IN glc.corpus")
      .collect().map(_.getString(1))
    assert(listed.contains("docs"))
    spark.sql("DROP TABLE glc.corpus.docs")
    assert(!new File(s"$wh/corpus/docs").exists())
  }

  test("catalog tables compose with the path-addressed surface: TVF time travel and DML procedures hit the same log") {
    val wh = warehouse
    graft.GraftExtensions.register(spark)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS glc.mix")
    spark.sql("CREATE TABLE glc.mix.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO glc.mix.t SELECT id, id FROM range(10)")
    val dir = s"$wh/mix/t"
    // DML procedure (path-addressed) mutates the catalog table
    spark.sql(s"SELECT version FROM graft_delete('$dir', 'k % 2 = 0')")
      .collect()
    assert(spark.sql("SELECT count(*) FROM glc.mix.t")
      .collect().head.getLong(0) === 5)
    // TVF time travel reads the pre-delete version of the same table
    assert(spark.sql(s"SELECT count(*) FROM graft_snapshot('$dir', 2)")
      .collect().head.getLong(0) === 10)
    // native DELETE FROM by name: one CoW commit, old state time-travels
    spark.sql("DELETE FROM glc.mix.t WHERE k > 7")
    assert(spark.sql("SELECT k FROM glc.mix.t ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === Seq(1L, 3L, 5L, 7L))
    assert(Export.snapshotOperation(dir,
      Export.latestSnapshotVersion(dir)) === Some("delete"))
    // name-addressed RENAME keeps the log intact (the new name resolves
    // inside the table's catalog, so it is catalog-less)
    spark.sql("ALTER TABLE glc.mix.t RENAME TO mix.t2")
    assert(spark.sql("SELECT count(*) FROM glc.mix.t2")
      .collect().head.getLong(0) === 4)
    intercept[Exception](
      spark.sql("SELECT * FROM glc.mix.t").collect())
  }

  test("CTAS by name: CREATE TABLE ... AS SELECT lands schema + rows in one statement") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS glc.ctas")
    spark.sql("CREATE TABLE glc.ctas.t AS " +
      "SELECT id AS k, id * 2 AS v FROM range(7)")
    val got = spark.sql("SELECT k, v FROM glc.ctas.t ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === (0L until 7L).map(i => (i, i * 2)))
    // the CTAS left a normal log: v1 typed-empty create + v2 append
    val dir = s"$wh/ctas/t"
    assert(Export.snapshotVersions(dir) === Seq(1, 2))
    assert(Export.snapshotSchema(dir, 1).get.fieldNames.toSeq ===
      Seq("k", "v"))
  }

  test("streaming by NAME: readStream.table and writeStream.toTable resolve through the catalog into the graftlake source/sink") {
    import org.apache.spark.sql.streaming.Trigger
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS glc.stream")
    spark.sql("CREATE TABLE glc.stream.src (k BIGINT, m BIGINT)")
    spark.sql("INSERT INTO glc.stream.src SELECT id, id % 3 FROM range(6)")
    spark.sql("INSERT INTO glc.stream.src SELECT id, id % 3 " +
      "FROM range(6, 12)")
    spark.sql("CREATE TABLE glc.stream.dst (k BIGINT, m BIGINT)")
    val q = spark.readStream.table("glc.stream.src")
      .filter(org.apache.spark.sql.functions.col("m") =!= 2L)
      .writeStream.format("graftlake")
      .option("checkpointLocation",
        Files.createTempDirectory("glc-stream-cp").toFile.getAbsolutePath)
      .trigger(Trigger.AvailableNow())
      .toTable("glc.stream.dst")
    assert(q.awaitTermination(120000))
    val got = spark.sql("SELECT k FROM glc.stream.dst ORDER BY k")
      .collect().map(_.getLong(0))
    assert(got.toSeq === (0L until 12L).filter(_ % 3 != 2))
    // the sink's exactly-once guard rode along: batch header present
    assert(Export.lastAppliedBatch(s"$wh/stream/dst") >= 0L)
  }

  test("MoR-deleted and column-mapped heads serve BY NAME: the anti-join rewrite and the physical-renaming format reach the catalog path") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS glc.gate")
    spark.sql("CREATE TABLE glc.gate.d (k BIGINT)")
    spark.sql("INSERT INTO glc.gate.d SELECT id FROM range(6)")
    val dir = s"$wh/gate/d"
    Export.deleteWhereMoR(spark, dir,
      org.apache.spark.sql.functions.col("k") < 2)
    // plain SQL by name subtracts the deleted rows, no compaction needed
    assert(spark.sql("SELECT k FROM glc.gate.d ORDER BY k")
      .collect().map(_.getLong(0)).toSeq === (2L until 6L))
    // rename with no rewrite: the new logical name serves by name too
    Export.renameSnapshotColumn(dir, "k", "key")
    assert(spark.sql("SELECT key FROM glc.gate.d WHERE key >= 4")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(4L, 5L))
    // compaction materializes both; results unchanged
    Export.compactSnapshot(spark, dir)
    assert(spark.sql("SELECT count(*) FROM glc.gate.d")
      .collect().head.getLong(0) === 4)
  }
}
