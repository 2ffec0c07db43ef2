package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class MydumpDiscoverySpec extends AnyFunSuite {
  val dir: String = getClass.getClassLoader.getResource("mydump").getPath

  test("classification by filename grammar") {
    assert(MydumpDiscovery.classify("db-schema-create.sql", "p", 1).kind === FileKind.SchemaCreate)
    assert(MydumpDiscovery.classify("db.t-schema.sql", "p", 1).kind === FileKind.TableSchema)
    val d = MydumpDiscovery.classify("db.t.42.sql", "p", 1)
    assert(d.kind === FileKind.SqlData && d.part === Some(42))
    assert(MydumpDiscovery.classify("db.t.CSV", "p", 1).kind === FileKind.CsvData)
    assert(MydumpDiscovery.classify("db.t-schema-view.sql", "p", 1).kind === FileKind.Ignored)
    assert(MydumpDiscovery.classify("README.md", "p", 1).kind === FileKind.Ignored)
  }

  test("exotic filenames: unicode and quote/backtick table names classify and import") {
    // reference tests/exotic_filenames/: 中文庫.中文表.sql and
    // x`f"n.exotic`table``name.sql must classify into their db/table names
    val cn = MydumpDiscovery.classify("中文庫.中文表.sql", "p", 1)
    assert(cn.kind === FileKind.SqlData && cn.db === "中文庫" && cn.table === "中文表")
    val xf = MydumpDiscovery.classify("x`f\"n.exotic`table``name.sql", "p", 1)
    assert(xf.kind === FileKind.SqlData && xf.db === "x`f\"n" &&
      xf.table === "exotic`table``name")
    assert(MydumpDiscovery.classify("中文庫-schema-create.sql", "p", 1).kind
      === FileKind.SchemaCreate)
    assert(MydumpDiscovery.classify("中文庫.中文表-schema.sql", "p", 1).kind
      === FileKind.TableSchema)
    // end-to-end with the quote/backtick name (this container's JVM fs
    // encoding cannot create unicode filenames — sun.jnu.encoding — so the
    // unicode case is covered by the classification asserts above)
    val src = java.nio.file.Files.createTempDirectory("graft-exotic").toFile
    java.nio.file.Files.writeString(
      new java.io.File(src, "x`f\"n.exotic`table``name.sql").toPath,
      "INSERT INTO `t` VALUES (1,'one'),(2,'two');\n")
    val table = MysqlDdl.parseCreateTable(
      "CREATE TABLE `t` (`id` int(11) NOT NULL, `v` varchar(8), PRIMARY KEY (`id`))")
    val out = java.nio.file.Files.createTempDirectory("graft-exotic-out").toString
    val spark = graft.SparkSpec.session
    val cfg = graft.pipeline.ImportConfig(sourceDir = src.getAbsolutePath,
      outDir = out,
      schemaCatalog = Map(("x`f\"n", "exotic`table``name") -> table))
    val reports = new graft.pipeline.ImportPipeline(spark, cfg).run()
    assert(reports.head.rows === 2)
    assert(spark.read.parquet(s"$out/x`f\"n/exotic`table``name")
      .select("v").collect().map(_.getString(0)).sorted.toSeq === Seq("one", "two"))
  }

  test("plan groups data files per table, small tables first") {
    val plan = MydumpDiscovery.plan(dir)
    val names = plan.tables.map(t => s"${t.db}.${t.table}")
    assert(names.contains("mdb.people") && names.contains("mdb.items"))
    val items = plan.tables.find(_.table == "items").get
    assert(items.dataFiles.map(_.part) === Seq(Some(1), Some(2)))
    assert(items.schemaFile.isDefined)
    // view file ignored
    assert(plan.ignored.exists(_.path.endsWith("mdb.ignoreme-schema-view.sql")))
    // sorted by size ascending
    assert(plan.tables.map(_.totalSize) === plan.tables.map(_.totalSize).sorted)
  }

  test("routing merges sharded source tables into one target") {
    val plan = MydumpDiscovery.plan(dir, routes = Seq(
      RouteRule("routes_a*", "t*", "routes_b", "u")))
    val merged = plan.tables.find(t => t.db == "routes_b" && t.table == "u")
    assert(merged.isDefined)
    assert(merged.get.dataFiles.size === 2) // t0.sql + t1.sql
  }

  test("black/white list filters tables and system schemas") {
    val f = TableFilter(ignoreTables = Seq(("mdb", "items")))
    val plan = MydumpDiscovery.plan(dir, filter = f)
    assert(!plan.tables.exists(_.table == "items"))
    assert(plan.tables.exists(_.table == "people"))
    val wl = TableFilter(doTables = Seq(("mdb", "people")))
    val plan2 = MydumpDiscovery.plan(dir, filter = wl)
    assert(plan2.tables.map(_.table) === Seq("people"))
  }
}
