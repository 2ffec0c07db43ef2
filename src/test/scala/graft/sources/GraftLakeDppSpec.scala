package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.Export
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** DYNAMIC FILE PRUNING through the surfaced partition schema (r16):
  * a partitioned lake table's manifest layout is declared as a real
  * `partitionSchema` (per-file values decoded from the `p=` tags), so
  * Spark's own DynamicPartitionPruning injects its runtime subquery on
  * selective dim ⋈ fact joins — the fact side plans a STRICT SUBSET of
  * its files at run time. These locks pin: the subset law, the
  * without-filter full set, result equality vs a DPP-disabled run,
  * static pruning through the same path, and the untagged fallback. */
class GraftLakeDppSpec extends SparkSpec {

  private lazy val warehouse: String = {
    val w = Files.createTempDirectory("dpp-wh").toFile
    spark.conf.set("spark.sql.catalog.dpp",
      classOf[GraftLakeCatalog].getName)
    spark.conf.set("spark.sql.catalog.dpp.warehouse", w.getAbsolutePath)
    w.getAbsolutePath
  }

  private def fileScansOf(p: SparkPlan): Seq[FileSourceScanExec] =
    p.collect {
      case f: FileSourceScanExec => Seq(f)
      case a: org.apache.spark.sql.execution.adaptive
          .AdaptiveSparkPlanExec => fileScansOf(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        fileScansOf(q.plan)
      case r: org.apache.spark.sql.execution.ReusedSubqueryExec =>
        fileScansOf(r.child)
    }.flatten

  private def lakeScans(df: DataFrame): Seq[FileSourceScanExec] =
    fileScansOf(df.queryExecution.executedPlan)
      .filter(_.relation.location.isInstanceOf[GraftLakeFileIndex])

  private def setupFact(): String = {
    val wh = warehouse
    spark.sql("CREATE NAMESPACE IF NOT EXISTS dpp.g")
    spark.sql("DROP TABLE IF EXISTS dpp.g.fact")
    spark.sql("CREATE TABLE dpp.g.fact (k BIGINT, lang STRING, " +
      "v BIGINT) PARTITIONED BY (lang)")
    spark.sql("INSERT INTO dpp.g.fact SELECT id, " +
      "CASE WHEN id % 5 = 0 THEN 'en' WHEN id % 5 = 1 THEN 'de' " +
      "WHEN id % 5 = 2 THEN 'fr' WHEN id % 5 = 3 THEN 'es' " +
      "ELSE 'zh' END, id FROM range(200)")
    s"$wh/g/fact"
  }

  test("selective dim join scans a strict subset of fact files at runtime (DPP), full set without the filter, and results match a DPP-disabled run") {
    val dir = setupFact()
    val v = Export.latestSnapshotVersion(dir)
    val allFiles = Export.snapshotFiles(dir, v).size
    assert(allFiles >= 5, s"expected >=5 partition files, got $allFiles")
    // dim: a parquet-backed relation with a selective filter the
    // optimizer cannot constant-fold into the fact scan
    val dimDir = Files.createTempDirectory("dpp-dim").toFile
    spark.range(5).selectExpr(
        "CASE WHEN id = 0 THEN 'en' WHEN id = 1 THEN 'de' " +
          "WHEN id = 2 THEN 'fr' WHEN id = 3 THEN 'es' " +
          "ELSE 'zh' END AS lang", "id AS w")
      .write.mode("overwrite").parquet(dimDir.getAbsolutePath)
    spark.read.parquet(dimDir.getAbsolutePath)
      .createOrReplaceTempView("dpp_dim")
    val q = "SELECT f.lang, count(*) AS n, sum(f.v) AS sv " +
      "FROM dpp.g.fact f JOIN dpp_dim m ON f.lang = m.lang " +
      "WHERE m.w < 2 GROUP BY f.lang ORDER BY f.lang"
    val withDpp = spark.sql(q)
    val got = withDpp.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    val scans = lakeScans(withDpp)
    assert(scans.nonEmpty, "no lake scan in the join plan")
    val dppScan = scans.find(_.metrics.contains("staticFilesNum"))
    assert(dppScan.isDefined,
      "DPP must fire on the fact side (no staticFilesNum metric => " +
        "no dynamic partition filter reached the scan)")
    val read = dppScan.get.metrics("numFiles").value
    val static = dppScan.get.metrics("staticFilesNum").value
    assert(read < static && static == allFiles,
      s"expected a strict subset of $allFiles files, read=$read " +
        s"static=$static")
    // results identical with DPP off
    spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    try {
      val off = spark.sql(q).collect().map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(off === got, "DPP changed results")
    } finally spark.conf.set(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    // without the selective filter every file plans
    val full = spark.sql("SELECT count(*) FROM dpp.g.fact f " +
      "JOIN dpp_dim m ON f.lang = m.lang")
    full.collect()
    val fullScan = lakeScans(full).head
    assert(fullScan.metrics("numFiles").value == allFiles,
      "an unfiltered join must plan every file")
  }

  test("static partition pruning flows through the surfaced schema (typed partition filters, one file per lang), and values decode from the p= tags exactly") {
    val dir = setupFact()
    val one = spark.sql(
      "SELECT k, v FROM dpp.g.fact WHERE lang = 'de' ORDER BY k")
    val rows = one.collect()
    assert(rows.map(_.getLong(0)).toSeq ===
      (0L until 200L).filter(_ % 5 == 1))
    val scan = lakeScans(one).head
    assert(scan.metrics("numFiles").value <
      Export.snapshotFiles(dir, Export.latestSnapshotVersion(dir)).size,
      "a partition-literal filter must prune files")
    // the partition VALUE itself round-trips through the tag decode
    val langs = spark.sql(
        "SELECT DISTINCT lang FROM dpp.g.fact ORDER BY lang")
      .collect().map(_.getString(0)).toSeq
    assert(langs === Seq("de", "en", "es", "fr", "zh"))
  }

  test("BIGINT layout columns surface typed (runtime-pruned joins work on non-string partitions)") {
    val wh = warehouse
    spark.sql("DROP TABLE IF EXISTS dpp.g.byday")
    spark.sql("CREATE TABLE dpp.g.byday (k BIGINT, day BIGINT, " +
      "v BIGINT) PARTITIONED BY (day)")
    spark.sql("INSERT INTO dpp.g.byday SELECT id, id % 4, id " +
      "FROM range(100)")
    spark.range(4).selectExpr("id AS day", "id AS w")
      .write.mode("overwrite").parquet(s"$wh/dppdim2")
    spark.read.parquet(s"$wh/dppdim2")
      .createOrReplaceTempView("dpp_dim2")
    val q = spark.sql("SELECT sum(f.v) AS sv FROM dpp.g.byday f " +
      "JOIN dpp_dim2 m ON f.day = m.day WHERE m.w = 1")
    assert(q.collect().head.getLong(0) ===
      (0L until 100L).filter(_ % 4 == 1).sum)
    val scan = lakeScans(q).find(_.metrics.contains("staticFilesNum"))
    assert(scan.isDefined && scan.get.metrics("numFiles").value <
      scan.get.metrics("staticFilesNum").value,
      "DPP must prune a BIGINT-partitioned fact")
  }

  test("OPTIMIZE ... RETAG restores DPP surfacing after an untagged epoch: single-tuple files re-stamp metadata-only, spanning files rewrite scoped, results identical") {
    val dir = setupFact()
    val expect = spark.sql("SELECT lang, count(*) AS n, sum(v) AS sv " +
        "FROM dpp.g.fact GROUP BY lang ORDER BY lang").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // legacy epoch 1: one en-only file (single-tuple -> metadata-only)
    Export.appendSnapshot(spark, spark.range(200, 240).selectExpr(
      "id AS k", "'en' AS lang", "id AS v").coalesce(1), dir)
    // legacy epoch 2: one file SPANNING de+fr (-> scoped rewrite)
    Export.appendSnapshot(spark, spark.range(240, 260).selectExpr(
      "id AS k", "CASE WHEN id % 2 = 0 THEN 'de' ELSE 'fr' END AS lang",
      "id AS v").coalesce(1), dir)
    val vLegacy = Export.latestSnapshotVersion(dir)
    val untaggedFiles = Export.snapshotFiles(dir, vLegacy).toSet --
      Export.snapshotFiles(dir, vLegacy - 2).toSet
    assert(untaggedFiles.size === 2)
    val expect2 = expect.map {
      case ("en", n, sv) => ("en", n + 40, sv + (200L until 240L).sum)
      case ("de", n, sv) => ("de", n + 10,
        sv + (240L until 260L).filter(_ % 2 == 0).sum)
      case ("fr", n, sv) => ("fr", n + 10,
        sv + (240L until 260L).filter(_ % 2 == 1).sum)
      case other => other
    }
    // ONE untagged epoch disables surfacing for the whole head
    val q0 = spark.sql("SELECT k, v FROM dpp.g.fact WHERE lang = 'de'")
    q0.collect()
    assert(lakeScans(q0).head.relation.partitionSchema.isEmpty,
      "an untagged epoch must disable surfacing (sound fallback)")
    val r = spark.sql("OPTIMIZE dpp.g.fact RETAG").collect().head
    assert(r.getLong(0) === (vLegacy + 1).toLong)
    val after = Export.snapshotFiles(dir, vLegacy + 1).toSet
    val (enFile, spanFile) = {
      val Seq(a, b) = untaggedFiles.toSeq
      if (after.contains(a)) (a, b) else (b, a)
    }
    assert(after.contains(enFile) && !after.contains(spanFile),
      "the single-tuple file must carry (metadata-only re-stamp); " +
        "only the spanning file rewrites")
    // surfacing is back on and DPP fires on the selective dim join
    val q = "SELECT f.lang, count(*) AS n, sum(f.v) AS sv " +
      "FROM dpp.g.fact f JOIN dpp_dim m ON f.lang = m.lang " +
      "WHERE m.w < 2 GROUP BY f.lang ORDER BY f.lang"
    val dimDir = Files.createTempDirectory("dpp-dim-rt").toFile
    spark.range(5).selectExpr(
        "CASE WHEN id = 0 THEN 'en' WHEN id = 1 THEN 'de' " +
          "WHEN id = 2 THEN 'fr' WHEN id = 3 THEN 'es' " +
          "ELSE 'zh' END AS lang", "id AS w")
      .write.mode("overwrite").parquet(dimDir.getAbsolutePath)
    spark.read.parquet(dimDir.getAbsolutePath)
      .createOrReplaceTempView("dpp_dim")
    val withDpp = spark.sql(q)
    val got = withDpp.collect().map(r2 =>
      (r2.getString(0), r2.getLong(1), r2.getLong(2))).toSeq
    assert(got === expect2.filter(t => t._1 == "en" || t._1 == "de")
      .sortBy(_._1), "RETAG must not change results")
    val dppScan = lakeScans(withDpp)
      .find(_.metrics.contains("staticFilesNum"))
    assert(dppScan.isDefined, "DPP must fire again after RETAG")
    assert(dppScan.get.metrics("numFiles").value <
      dppScan.get.metrics("staticFilesNum").value,
      "the retagged head must runtime-prune to a strict subset")
    // full-table check: every row survived the retag
    val all = spark.sql("SELECT lang, count(*) AS n, sum(v) AS sv " +
        "FROM dpp.g.fact GROUP BY lang ORDER BY lang").collect()
      .map(r2 => (r2.getString(0), r2.getLong(1), r2.getLong(2))).toSeq
    assert(all === expect2.sortBy(_._1))
  }

  test("RETAG BY (cols) retrofits surfacing onto a never-partitioned table (explicit layout, lang-pure files re-stamp in place)") {
    val wh = warehouse
    spark.sql("DROP TABLE IF EXISTS dpp.g.legacy")
    spark.sql("CREATE TABLE dpp.g.legacy (k BIGINT, lang STRING, " +
      "v BIGINT)")
    val dir = s"$wh/g/legacy"
    // three lang-pure single files: retag is then METADATA-ONLY
    Seq("en", "de", "fr").zipWithIndex.foreach { case (l, i) =>
      Export.appendSnapshot(spark, spark.range(i * 10, i * 10 + 10)
        .selectExpr("id AS k", s"'$l' AS lang", "id AS v")
        .coalesce(1), dir)
    }
    // no declared layout: bare RETAG must refuse, BY (lang) works
    val bare = intercept[Exception](
      spark.sql("OPTIMIZE dpp.g.legacy RETAG").collect())
    assert(bare.getMessage.contains("no declared or tagged"))
    val before = Export.snapshotFiles(dir,
      Export.latestSnapshotVersion(dir)).toSet
    spark.sql("OPTIMIZE dpp.g.legacy RETAG BY (lang)").collect()
    val v = Export.latestSnapshotVersion(dir)
    assert(Export.snapshotFiles(dir, v).toSet === before,
      "lang-pure files must re-stamp in place (zero rewrites)")
    val one = spark.sql(
      "SELECT k FROM dpp.g.legacy WHERE lang = 'de' ORDER BY k")
    assert(one.collect().map(_.getLong(0)).toSeq ===
      (10L until 20L).toSeq)
    val scan = lakeScans(one).head
    assert(scan.relation.partitionSchema.nonEmpty,
      "RETAG BY must surface the retrofitted layout")
    assert(scan.metrics("numFiles").value === 1L,
      "a partition-literal filter must plan exactly the one pure file")
  }

  test("RETAG refusal matrix: DV-carrying untagged lines refuse loudly (compact first); NULL layout values refuse; a fully-tagged head is a no-op") {
    val wh = warehouse
    spark.sql("DROP TABLE IF EXISTS dpp.g.rtref")
    spark.sql("CREATE TABLE dpp.g.rtref (k BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.sql("INSERT INTO dpp.g.rtref SELECT id, " +
      "CASE WHEN id % 2 = 0 THEN 'en' ELSE 'de' END FROM range(20)")
    val dir = s"$wh/g/rtref"
    // fully tagged: RETAG is a version-preserving no-op
    val v0 = Export.latestSnapshotVersion(dir)
    assert(Export.retagSnapshotPartitions(spark, dir) === v0)
    // untagged epoch + MoR delete on it -> dv= on an untagged line
    Export.appendSnapshot(spark, spark.range(100, 110).selectExpr(
      "id AS k", "'en' AS lang").coalesce(1), dir)
    Export.deleteWhereMoR(spark, dir,
      org.apache.spark.sql.functions.col("k") === 105L)
    val e = intercept[IllegalArgumentException](
      Export.retagSnapshotPartitions(spark, dir))
    assert(e.getMessage.contains("deletion vectors"), e.getMessage)
    // an explicit layout that DISAGREES with existing tags refuses —
    // a tag backfill must never silently re-layout a partitioned table
    val e3 = intercept[IllegalArgumentException](
      Export.retagSnapshotPartitions(spark, dir, Seq("k")))
    assert(e3.getMessage.contains("re-layout"), e3.getMessage)
    // NULL layout value in an untagged file refuses
    spark.sql("DROP TABLE IF EXISTS dpp.g.rtnull")
    spark.sql("CREATE TABLE dpp.g.rtnull (k BIGINT, lang STRING) " +
      "PARTITIONED BY (lang)")
    spark.sql("INSERT INTO dpp.g.rtnull SELECT id, 'en' FROM range(5)")
    val dir2 = s"$wh/g/rtnull"
    Export.appendSnapshot(spark, spark.range(5, 8).selectExpr(
      "id AS k", "CAST(NULL AS STRING) AS lang").coalesce(1), dir2)
    val e2 = intercept[IllegalArgumentException](
      Export.retagSnapshotPartitions(spark, dir2))
    assert(e2.getMessage.contains("NULL"), e2.getMessage)
  }

  test("fallback: unpartitioned tables and untagged heads keep the empty partition schema (no surfacing, identical planning)") {
    val wh = warehouse
    spark.sql("DROP TABLE IF EXISTS dpp.g.plain")
    spark.sql("CREATE TABLE dpp.g.plain (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO dpp.g.plain SELECT id, id FROM range(10)")
    val df = spark.sql("SELECT * FROM dpp.g.plain WHERE k > 3")
    df.collect()
    val scan = lakeScans(df).head
    assert(scan.relation.partitionSchema.isEmpty,
      "an unpartitioned table must not surface a partition schema")
    // a DOUBLE layout column does not string-roundtrip: the engine
    // must fall back rather than serve cast-lossy partition values
    spark.sql("DROP TABLE IF EXISTS dpp.g.dbl")
    spark.sql("CREATE TABLE dpp.g.dbl (k BIGINT, r DOUBLE, v BIGINT) " +
      "PARTITIONED BY (r)")
    spark.sql("INSERT INTO dpp.g.dbl SELECT id, CAST(id % 2 AS DOUBLE)" +
      " + 0.5, id FROM range(10)")
    val d2 = spark.sql("SELECT sum(v) FROM dpp.g.dbl WHERE r > 1.0")
    assert(d2.collect().head.getLong(0) ===
      (0L until 10L).filter(_ % 2 == 1).sum)
    val s2 = lakeScans(d2).head
    assert(s2.relation.partitionSchema.isEmpty,
      "a non-roundtrip layout type must not surface")
  }
}
