package graft.plans

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Export
import graft.sources.GraftLakeCatalog

/** Persistent SQL views in the lake catalog: CREATE/DROP/SHOW VIEW and
  * text re-expansion on read ([[RewriteGraftLakeDdl]]) — Spark has no
  * v2 view exec path, so the extension seam carries the statements. */
class GraftLakeViewSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("glv-warehouse").toFile
    spark.conf.set("spark.sql.catalog.glv",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.glv.warehouse", w.getAbsolutePath)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS glv.ns")
    w.getAbsolutePath
  }

  test("CREATE VIEW persists SQL text, reads expand by name (with a positional column list), SHOW VIEWS lists, DROP VIEW removes; EXPLAIN CREATE VIEW writes nothing") {
    val wh = warehouse
    spark.sql("CREATE TABLE glv.ns.t (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO glv.ns.t SELECT id, id * 10 FROM range(6)")
    // EXPLAIN defers: no _view file appears
    spark.sql("EXPLAIN COST CREATE VIEW glv.ns.w AS " +
      "SELECT k, v + 1 AS v1 FROM glv.ns.t WHERE k % 2 = 0").collect()
    assert(GraftLakeViews.readView(s"$wh/ns/w").isEmpty,
      "EXPLAIN CREATE VIEW must not write the view")
    spark.sql("CREATE VIEW glv.ns.w (key, bumped) AS " +
      "SELECT k, v + 1 FROM glv.ns.t WHERE k % 2 = 0")
    assert(GraftLakeViews.readView(s"$wh/ns/w").isDefined)
    val got = spark.sql(
        "SELECT key, bumped FROM glv.ns.w ORDER BY key")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq === Seq((0L, 1L), (2L, 21L), (4L, 41L)))
    // the alias resolves qualified reads and star expansion
    assert(spark.sql("SELECT w.key FROM glv.ns.w w WHERE w.bumped > 1")
      .collect().length === 2)
    // SHOW VIEWS (+ LIKE pattern)
    val shown = spark.sql("SHOW VIEWS IN glv.ns").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2)))
    assert(shown.toSeq === Seq(("ns", "w", false)))
    assert(spark.sql("SHOW VIEWS IN glv.ns LIKE 'nope*'").collect()
      .isEmpty)
    // duplicate create refuses; IF NOT EXISTS and OR REPLACE don't
    intercept[Exception](spark.sql(
      "CREATE VIEW glv.ns.w AS SELECT 1 AS one"))
    spark.sql("CREATE VIEW IF NOT EXISTS glv.ns.w AS SELECT 1 AS one")
    assert(spark.sql("SELECT count(*) FROM glv.ns.w")
      .collect().head.getLong(0) === 3, "IF NOT EXISTS must keep the " +
      "existing definition")
    spark.sql("CREATE OR REPLACE VIEW glv.ns.w AS " +
      "SELECT k FROM glv.ns.t")
    assert(spark.sql("SELECT count(*) FROM glv.ns.w")
      .collect().head.getLong(0) === 6)
    spark.sql("DROP VIEW glv.ns.w")
    assert(GraftLakeViews.readView(s"$wh/ns/w").isEmpty)
    intercept[Exception](spark.sql("DROP VIEW glv.ns.w"))
    spark.sql("DROP VIEW IF EXISTS glv.ns.w") // no-op
  }

  test("views compose: view-over-view expands transitively, schema-evolution binding follows base-table changes, cycles refuse at read") {
    val wh = warehouse
    spark.sql("CREATE TABLE glv.ns.base (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO glv.ns.base SELECT id, id FROM range(4)")
    spark.sql("CREATE VIEW glv.ns.l1 AS " +
      "SELECT * FROM glv.ns.base WHERE k < 3")
    spark.sql("CREATE VIEW glv.ns.l2 AS " +
      "SELECT sum(v) AS s FROM glv.ns.l1")
    assert(spark.sql("SELECT s FROM glv.ns.l2")
      .collect().head.getLong(0) === 3L)
    // EVOLUTION binding: the view text re-resolves, so a base ADD
    // COLUMN flows through l1's star on the very next read
    spark.sql("ALTER TABLE glv.ns.base ADD COLUMN extra BIGINT")
    assert(spark.sql("SELECT * FROM glv.ns.l1").columns.toSeq ===
      Seq("k", "v", "extra"))
    // a cycle (only reachable via OR REPLACE) refuses loudly
    spark.sql("CREATE OR REPLACE VIEW glv.ns.l1 AS " +
      "SELECT s AS k FROM glv.ns.l2")
    val e = intercept[Exception](spark.sql("SELECT * FROM glv.ns.l2")
      .collect())
    assert(e.getMessage.toLowerCase.contains("cyclic"))
  }

  test("ALTER VIEW ... AS swaps the stored text in place: new body on the next read, column list cleared, missing view and table targets refuse") {
    val wh = warehouse
    spark.sql("CREATE TABLE glv.ns.at (k BIGINT)")
    spark.sql("INSERT INTO glv.ns.at SELECT id FROM range(5)")
    spark.sql("CREATE VIEW glv.ns.av (n) AS " +
      "SELECT count(*) FROM glv.ns.at")
    assert(spark.sql("SELECT n FROM glv.ns.av")
      .collect().head.getLong(0) === 5L)
    spark.sql("ALTER VIEW glv.ns.av AS SELECT max(k) AS m FROM glv.ns.at")
    assert(spark.sql("SELECT m FROM glv.ns.av")
      .collect().head.getLong(0) === 4L)
    intercept[Exception](spark.sql(
      "ALTER VIEW glv.ns.nosuch AS SELECT 1 AS one"))
    val e = intercept[Exception](spark.sql(
      "ALTER VIEW glv.ns.at AS SELECT 1 AS one"))
    assert(e.getMessage.contains("TABLE"))
  }

  test("guard rails: persistent views refuse temp-view references, CREATE VIEW cannot shadow a table, DROP VIEW on a table points to DROP TABLE") {
    val wh = warehouse
    spark.sql("CREATE TABLE glv.ns.tbl (k BIGINT)")
    spark.sql("INSERT INTO glv.ns.tbl VALUES (1)")
    spark.range(3).createOrReplaceTempView("glv_tmp")
    val e1 = intercept[Exception](spark.sql(
      "CREATE VIEW glv.ns.overtmp AS SELECT * FROM glv_tmp"))
    assert(e1.getMessage.toUpperCase.contains("TEMPORARY"))
    assert(GraftLakeViews.readView(s"$wh/ns/overtmp").isEmpty)
    val e2 = intercept[Exception](spark.sql(
      "CREATE VIEW glv.ns.tbl AS SELECT 1 AS one"))
    assert(e2.getMessage.contains("TABLE"))
    val e3 = intercept[Exception](spark.sql("DROP VIEW glv.ns.tbl"))
    assert(e3.getMessage.contains("DROP TABLE"))
    // and the table is intact
    assert(spark.sql("SELECT count(*) FROM glv.ns.tbl")
      .collect().head.getLong(0) === 1L)
    // a view is not a write target: every DML statement refuses loudly
    spark.sql("CREATE VIEW glv.ns.roview AS SELECT k FROM glv.ns.tbl")
    // ...and CREATE TABLE cannot shadow a view either (manifests
    // beside _view would make every read expand the view, hiding the
    // table silently)
    val e4 = intercept[Exception](spark.sql(
      "CREATE TABLE glv.ns.roview (x BIGINT)"))
    assert(e4.getMessage.contains("VIEW"))
    for (stmt <- Seq(
        "INSERT INTO glv.ns.roview VALUES (9)",
        "UPDATE glv.ns.roview SET k = 9 WHERE k = 1",
        "DELETE FROM glv.ns.roview WHERE k = 1",
        "MERGE INTO glv.ns.roview t USING glv.ns.tbl s ON t.k = s.k " +
          "WHEN MATCHED THEN DELETE")) {
      val e = intercept[Exception](spark.sql(stmt))
      assert(e.getMessage.contains("VIEW"), s"$stmt: ${e.getMessage}")
    }
  }

  test("USE a lake catalog: 1-2-part view names resolve through the current catalog/namespace, temp views keep 1-part precedence, view text binds to its CREATION context") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS glv.short")
    spark.sql("CREATE TABLE glv.short.st (k BIGINT)")
    spark.sql("INSERT INTO glv.short.st SELECT id FROM range(4)")
    try {
      spark.sql("USE glv.short")
      // short CREATE + short TEXT: both qualify with the current
      // catalog/namespace; the text's binding is stored with the view
      spark.sql("CREATE VIEW sv AS SELECT k FROM st WHERE k % 2 = 0")
      assert(GraftLakeViews.readView(s"$wh/short/sv").isDefined,
        "short CREATE VIEW must land under the current namespace")
      assert(spark.sql("SELECT count(*) FROM sv")
        .collect().head.getLong(0) === 2)
      assert(spark.sql("SELECT count(*) FROM short.sv")
        .collect().head.getLong(0) === 2)
      assert(spark.sql("SHOW VIEWS").collect().map(_.getString(1))
        .contains("sv"), "SHOW VIEWS must list under the current ns")
      // a TEMP view claims the 1-part name (the Spark precedence law)
      spark.range(1).selectExpr("CAST(99 AS BIGINT) AS k")
        .createOrReplaceTempView("sv")
      assert(spark.sql("SELECT k FROM sv").collect().head.getLong(0)
        === 99, "a temp view must win the short name")
      spark.catalog.dropTempView("sv")
      // DML on a short view name still refuses
      val e = intercept[Exception](spark.sql(
        "DELETE FROM sv WHERE k = 0"))
      assert(e.getMessage.contains("VIEW"))
    } finally spark.sql("USE spark_catalog.default")
    // the stored text referenced bare `st`: from a DIFFERENT session
    // state it must still resolve against the creation context
    assert(spark.sql("SELECT count(*) FROM glv.short.sv")
      .collect().head.getLong(0) === 2,
      "view text must bind to its creation catalog/namespace")
    spark.sql("DROP VIEW glv.short.sv")
  }

  test("CREATE OR REPLACE VIEW is atomic: a reader loop racing repeated replaces never observes a missing or torn view") {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS glv.race")
    spark.sql("CREATE VIEW glv.race.rv AS SELECT 0 AS gen")
    @volatile var failure: Option[Throwable] = None
    @volatile var stop = false
    val reader = new Thread(() => {
      try {
        while (!stop) {
          val vd = GraftLakeViews.readView(s"$wh/race/rv")
          assert(vd.isDefined, "view vanished during replace")
          assert(vd.get.sql.contains("AS gen"), s"torn view: ${vd.get.sql}")
        }
      } catch { case t: Throwable => failure = Some(t) }
    })
    reader.start()
    try {
      (1 to 50).foreach { i =>
        spark.sql(s"CREATE OR REPLACE VIEW glv.race.rv AS " +
          s"SELECT $i AS gen")
        if (failure.isDefined) throw failure.get
      }
    } finally { stop = true; reader.join(10000) }
    failure.foreach(throw _)
    assert(spark.sql("SELECT gen FROM glv.race.rv")
      .collect().head.getInt(0) === 50)
  }
}
