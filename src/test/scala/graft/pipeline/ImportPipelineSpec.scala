package graft.pipeline

import graft.SparkSpec
import graft.sources.{RouteRule, TableFilter}

class ImportPipelineSpec extends SparkSpec {

  private def freshOut(): String =
    java.nio.file.Files.createTempDirectory("graft-import").toString

  test("concurrent pipelines: two importers share one out dir + commit log") {
    // the fleet shape (reference tests/concurrent-restore: several
    // importers on one target; graft's per-table/per-chunk state files
    // under _state/ make cross-table coordination lock-free): two
    // ImportPipeline INSTANCES with disjoint table filters run on two
    // threads against the SAME outDir with checkpoints on — everything
    // imports, states are intact, and a third full run resumes by skip
    val src = java.nio.file.Files.createTempDirectory("graft-conc").toFile
    val n = 8
    (1 to n).foreach { i =>
      java.nio.file.Files.writeString(
        new java.io.File(src, f"rc.tbl$i-schema.sql").toPath,
        s"CREATE TABLE `tbl$i` (`i` tinyint(4))")
      java.nio.file.Files.writeString(
        new java.io.File(src, f"rc.tbl$i.sql").toPath,
        s"INSERT INTO `tbl$i` VALUES (1);\n")
    }
    val out = freshOut()
    def cfgFor(tables: Seq[Int]) = ImportConfig(
      sourceDir = src.getAbsolutePath, outDir = out,
      filter = TableFilter(doTables = tables.map(i => ("rc", s"tbl$i"))))
    val odd = (1 to n).filter(_ % 2 == 1)
    val even = (1 to n).filter(_ % 2 == 0)
    @volatile var r1: Seq[TableReport] = Nil
    @volatile var r2: Seq[TableReport] = Nil
    val t1 = new Thread(() => r1 = new ImportPipeline(spark, cfgFor(odd)).run())
    val t2 = new Thread(() => r2 = new ImportPipeline(spark, cfgFor(even)).run())
    t1.start(); t2.start(); t1.join(120000); t2.join(120000)
    assert((r1 ++ r2).size === n)
    assert((r1 ++ r2).forall(r => r.error.isEmpty && r.rows == 1L))
    for (i <- 1 to n)
      assert(spark.read.parquet(s"$out/rc/tbl$i")
        .agg(org.apache.spark.sql.functions.sum("i")).collect()(0)
        .getLong(0) === 1L)
    // a third run over ALL tables sees every state and skips by resume
    val again = new ImportPipeline(spark, cfgFor(1 to n)).run()
    assert(again.size === n && again.forall(_.resumedSkip), again)
  }

  test("end-to-end: fixture dump dir → parquet + checksums + commit log") {
    val out = freshOut()
    val cfg = ImportConfig(
      sourceDir = fixture("mydump"),
      outDir = out,
      filter = TableFilter(doTables = Seq(("mdb", "*"))),
      // people.csv carries a quoted-newline field → univocity quirk path
      csv = graft.sources.CsvConfig(multiLine = true),
      exactRowIds = true)
    val reports = new ImportPipeline(spark, cfg).run()
    val byTable = reports.map(r => r.table -> r).toMap
    assert(byTable.keySet === Set("people", "items"))
    assert(byTable("items").rows === 5)
    assert(byTable("people").rows === 3)
    assert(byTable("items").dataKvs === 5)
    assert(byTable("items").dataChecksum !== 0L)

    // written parquet round-trips with declared schema
    val items = spark.read.parquet(s"$out/mdb/items")
    assert(items.columns.toSeq ===
      Seq("item_id", "sku", "qty", "price", "tag", "_row_id"))
    assert(items.select("_row_id").collect().map(_.getLong(0)).sorted.toSeq ===
      (1L to 5L)) // contiguous across the two shards
    val r = items.filter("item_id = 2").collect()(0)
    assert(r.getString(1) === "has'quote")
    assert(r.isNullAt(3))
    val sci = items.filter("item_id = 4").collect()(0)
    assert(sci.getAs[java.math.BigDecimal]("price").doubleValue() === 250.0)

    // A3: the observe-time (pipeline) checksum triple must equal an
    // independent sink-side re-scan (what the verify CLI compares)
    val itemsTable = graft.sources.MysqlDdl.parseCreateTable(
      java.nio.file.Files.readString(
        new java.io.File(fixture("mydump"), "mdb.items-schema.sql").toPath))
    val cs = graft.operators.KvEncode.checksumReport(items, itemsTable,
      ImportPipeline.tableId("mdb", "items"), "_row_id")
      .filter(org.apache.spark.sql.functions.col("kv_class") === "data")
      .collect()(0)
    assert(cs.getLong(1) === byTable("items").dataChecksum)
    assert(cs.getLong(2) === byTable("items").dataBytes)
    assert(cs.getLong(3) === byTable("items").dataKvs)

    // resume: second run skips everything, checksums identical
    val again = new ImportPipeline(spark, cfg).run()
    assert(again.forall(_.resumedSkip))
    assert(again.map(r => r.table -> r.dataChecksum).toMap ===
      reports.map(r => r.table -> r.dataChecksum).toMap)
  }

  test("bucketed output: joins on the bucket key plan with no exchange") {
    val out = freshOut()
    val cfg = ImportConfig(
      sourceDir = fixture("mydump"),
      outDir = out,
      filter = TableFilter(doTables = Seq(("mdb", "items"))),
      bucketBy = Some((4, Seq("item_id"))))
    val reports = new ImportPipeline(spark, cfg).run()
    assert(reports.map(_.rows) === Seq(5))
    // bucket layout is catalog metadata: spark.table sees it
    val t = spark.table("mdb.items")
    assert(t.count() === 5)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = t.as("a").join(t.as("b"), "item_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed self-join must not shuffle:\n$plan")
      assert(joined.count() === 5)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS mdb.items")
  }

  test("post-import compaction: chunk-append small files rewritten, content unchanged") {
    val out = freshOut()
    def cfg(compact: Option[Long]) = ImportConfig(
      sourceDir = fixture("mydump"),
      outDir = out,
      filter = TableFilter(doTables = Seq(("mdb", "items"))),
      checkpointEnabled = false,
      // tiny chunk groups → one parquet file per shard before compaction
      minChunkBytes = 1L, chunkCommitBytes = 1L,
      compactTargetBytes = compact)
    def partFiles = new java.io.File(s"$out/mdb/items").listFiles()
      .count(f => f.isFile && f.getName.startsWith("part-"))
    val before = new ImportPipeline(spark, cfg(None)).run()
    assert(partFiles > 1, "fixture should produce multiple chunk files")
    val uncompacted = spark.read.parquet(s"$out/mdb/items")
      .orderBy("_row_id").collect().toSeq
    val after = new ImportPipeline(spark, cfg(Some(128L * 1024 * 1024))).run()
    assert(partFiles === 1, "compaction should leave one ~128 MiB-target file")
    val compacted = spark.read.parquet(s"$out/mdb/items")
      .orderBy("_row_id").collect().toSeq
    assert(compacted === uncompacted)
    assert(after.map(_.dataChecksum) === before.map(_.dataChecksum))
    // a stale _precompact_ backup (crash after swap, before cleanup) must
    // be cleared by the next compact even when the table is already
    // compact — otherwise a full-size copy survives forever
    val stale = new java.io.File(s"$out/mdb/_precompact_items")
    stale.mkdirs()
    java.nio.file.Files.writeString(
      new java.io.File(stale, "part-stale").toPath, "x")
    new graft.sinks.ParquetSink(out)
      .compact(spark, "mdb", "items", 128L * 1024 * 1024)
    assert(!stale.exists(), "stale pre-compact backup must be deleted")
  }

  test("no-schema mode: schemaless data files use the provided catalog") {
    val src = java.nio.file.Files.createTempDirectory("graft-ns").toFile
    java.nio.file.Files.writeString(
      new java.io.File(src, "ns.bare.sql").toPath,
      "INSERT INTO `bare` VALUES (1,'a'),(2,'b');\n")
    val table = graft.sources.MysqlDdl.parseCreateTable(
      "CREATE TABLE `bare` (`id` int(11) NOT NULL, `v` varchar(8), PRIMARY KEY (`id`))")
    val out = freshOut()
    val cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
      schemaCatalog = Map(("ns", "bare") -> table))
    val reports = new ImportPipeline(spark, cfg).run()
    assert(reports.head.rows === 2)
    val got = spark.read.parquet(s"$out/ns/bare")
    assert(got.columns.take(2).toSeq === Seq("id", "v"))
    assert(got.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2))
  }

  test("catalog registration: imported tables queryable via spark.sql") {
    val out = freshOut()
    val cfg = ImportConfig(
      sourceDir = fixture("mydump"), outDir = out,
      filter = TableFilter(doTables = Seq(("mdb", "items"))),
      registerInCatalog = true)
    new ImportPipeline(spark, cfg).run()
    val n = spark.sql("SELECT COUNT(*) FROM `mdb`.`items` WHERE qty > 0")
      .collect()(0).getLong(0)
    assert(n === 4)
    // postAnalyze (reference postProcess step 5): the catalog entry must
    // carry statistics — downstream CBO planning starts with a row count
    val statsRow = spark.sql("DESCRIBE TABLE EXTENDED `mdb`.`items`")
      .filter("col_name = 'Statistics'").collect()
    assert(statsRow.nonEmpty, "no Statistics row in DESCRIBE EXTENDED")
    assert(statsRow.head.getString(1).contains("5 rows"),
      s"expected analyzed '5 rows', got ${statsRow.head.getString(1)}")
    spark.sql("DROP TABLE `mdb`.`items`")
    spark.sql("DROP DATABASE `mdb`")
  }

  test("JDBC checkpoint driver: import commits state to the DB, rerun skips") {
    val out = freshOut()
    val cfg = ImportConfig(
      sourceDir = fixture("mydump"), outDir = out,
      filter = TableFilter(doTables = Seq(("mdb", "items"))),
      checkpointUrl = Some("jdbc:derby:memory:ckpt_e2e;create=true"))
    val first = new ImportPipeline(spark, cfg).run()
    assert(first.size === 1 && first.head.rows === 5 &&
      !first.head.resumedSkip)
    // no file-driver state on disk — the state went to the database
    assert(!new java.io.File(s"$out/_state").exists())
    // a second run (same inputs) resumes off the DB state and skips
    val second = new ImportPipeline(spark, cfg).run()
    assert(second.head.resumedSkip, "rerun should skip via JDBC checkpoint")
    assert(second.head.rows === 5 &&
      second.head.dataChecksum === first.head.dataChecksum)
  }

  test("resume invalidation: changed inputs re-import instead of skipping") {
    // copy the fixture so we can mutate a data file
    val src = java.nio.file.Files.createTempDirectory("graft-src").toFile
    new java.io.File(fixture("mydump")).listFiles()
      .filter(_.getName.startsWith("mdb."))
      .foreach(f => java.nio.file.Files.copy(f.toPath,
        new java.io.File(src, f.getName).toPath))
    val out = freshOut()
    val cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
      filter = TableFilter(doTables = Seq(("mdb", "items"))))
    val first = new ImportPipeline(spark, cfg).run()
    assert(!first.head.resumedSkip && first.head.rows === 5)
    // same inputs → skip
    assert(new ImportPipeline(spark, cfg).run().head.resumedSkip)
    // grow a data file → fingerprint changes → full re-import
    val shard = new java.io.File(src, "mdb.items.2.sql")
    java.nio.file.Files.writeString(shard.toPath,
      java.nio.file.Files.readString(shard.toPath) +
        "\nINSERT INTO `items` VALUES (6,'new',1,1.0,NULL);\n")
    val third = new ImportPipeline(spark, cfg).run()
    assert(!third.head.resumedSkip)
    assert(third.head.rows === 6)
  }

  test("mixed statement column lists in one file align per statement") {
    val src = java.nio.file.Files.createTempDirectory("graft-mix").toFile
    java.nio.file.Files.writeString(
      new java.io.File(src, "mx.t.sql").toPath,
      """INSERT INTO `t` (`v`,`id`) VALUES ('a',1),('b',2);
        |INSERT INTO `t` VALUES (3,'c',9);
        |INSERT INTO `t` (`id`) VALUES (4);
        |""".stripMargin)
    val table = graft.sources.MysqlDdl.parseCreateTable(
      """CREATE TABLE `t` (`id` int(11) NOT NULL,
        | `v` varchar(8) DEFAULT 'dv', `n` int(11) DEFAULT '5',
        | PRIMARY KEY (`id`))""".stripMargin)
    val out = freshOut()
    val cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
      schemaCatalog = Map(("mx", "t") -> table))
    assert(new ImportPipeline(spark, cfg).run().head.rows === 4)
    val got = spark.read.parquet(s"$out/mx/t")
      .select("id", "v", "n").collect()
      .map(r => (r.getInt(0), r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1, "a", 5), (2, "b", 5), (3, "c", 9), (4, "dv", 5)))
  }

  test("chunk-level resume: crashed table resumes from last committed chunk") {
    import graft.operators.SqlMode
    val src = java.nio.file.Files.createTempDirectory("graft-chunk").toFile
    def writeCsv(name: String, body: String): Unit =
      java.nio.file.Files.writeString(new java.io.File(src, name).toPath, body)
    writeCsv("ck.t.0001.csv", (1 to 50).map(i => s"$i,$i.5").mkString("", "\n", "\n"))
    // second chunk carries a strict-cast poison row → the run dies AFTER
    // chunk 1 committed
    writeCsv("ck.t.0002.csv", (51 to 99).map(i => s"$i,$i.5").mkString("", "\n", "") +
      "\n100,junk\n")
    val table = graft.sources.MysqlDdl.parseCreateTable(
      "CREATE TABLE `t` (`id` int(11) NOT NULL, `v` double, PRIMARY KEY (`id`))")
    val out = freshOut()
    def cfg(mode: SqlMode) = ImportConfig(sourceDir = src.getAbsolutePath,
      outDir = out, sqlMode = mode,
      schemaCatalog = Map(("ck", "t") -> table),
      chunkCommitBytes = 64) // force one group per file
    intercept[Throwable] { new ImportPipeline(spark, cfg(SqlMode.Strict)).run() }
    val hconf = spark.sparkContext.hadoopConfiguration
    val log = new graft.sinks.CommitLog(out, hconf)
    val committed = log.readChunks("ck", "t")
    assert(committed.size === 1) // chunk 1 survived the crash
    val chunk1Files = new java.io.File(s"$out/ck/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    assert(chunk1Files.nonEmpty)
    // repair the poison row with SAME byte length (fingerprint is
    // size-based, so chunk 1 stays valid) and rerun
    writeCsv("ck.t.0002.csv", (51 to 99).map(i => s"$i,$i.5").mkString("", "\n", "") +
      "\n100,99.5\n")
    val report = new ImportPipeline(spark, cfg(SqlMode.Strict)).run().head
    assert(report.rows === 100)
    // chunk 1's output files were not rewritten
    val after = new java.io.File(s"$out/ck/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).map(f => f.getName -> f.lastModified).toMap
    chunk1Files.foreach { case (name, mtime) =>
      assert(after.contains(name) && after(name) === mtime,
        s"chunk-1 file $name was rewritten on resume")
    }
    // checksum triple equals a from-scratch import of the repaired inputs
    val fresh = freshOut()
    val freshReport = new ImportPipeline(spark,
      cfg(SqlMode.Strict).copy(outDir = fresh)).run().head
    assert(report.dataChecksum === freshReport.dataChecksum)
    assert(report.dataBytes === freshReport.dataBytes)
    assert(report.dataKvs === freshReport.dataKvs)
    // and the written rows are complete and distinct
    assert(spark.read.parquet(s"$out/ck/t").select("id").distinct().count() === 100)
  }

  test("line-based CSV: row ids stable across input split configurations") {
    val src = java.nio.file.Files.createTempDirectory("graft-lx").toFile
    val sb = new StringBuilder
    (0 until 300).foreach(i => sb ++= s"$i,val_$i\n")
    java.nio.file.Files.writeString(
      new java.io.File(src, "lx.t.csv").toPath, sb.toString)
    val table = graft.sources.MysqlDdl.parseCreateTable(
      "CREATE TABLE `t` (`id` int(11) NOT NULL, `v` varchar(16), PRIMARY KEY (`id`))")
    def runOnce(): Seq[(Int, Long)] = {
      val out = freshOut()
      val cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
        schemaCatalog = Map(("lx", "t") -> table))
      new ImportPipeline(spark, cfg).run()
      spark.read.parquet(s"$out/lx/t").select("id", "_row_id").collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    val whole = runOnce()
    val hc = spark.sparkContext.hadoopConfiguration
    val key = "mapreduce.input.fileinputformat.split.maxsize"
    val split = try { hc.set(key, "512"); runOnce() } finally hc.unset(key)
    assert(split === whole) // identical ids under a different split plan
    assert(whole.map(_._2).distinct.length === 300)
  }

  test("estimated row-ids (default): disjoint increasing ranges, gaps ok") {
    val out = freshOut()
    val cfg = ImportConfig(
      sourceDir = fixture("mydump"),
      outDir = out,
      filter = TableFilter(doTables = Seq(("mdb", "items"))))
    new ImportPipeline(spark, cfg).run()
    val ids = spark.read.parquet(s"$out/mdb/items")
      .select("item_id", "_row_id").collect()
      .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    // file 1 holds items 1-3, file 2 holds 4-5; within-file contiguous,
    // cross-file disjoint and increasing (the S8 estimate semantics)
    assert(ids.take(3).map(_._2).toSeq === Seq(ids(0)._2, ids(0)._2 + 1, ids(0)._2 + 2))
    assert(ids(3)._2 > ids(2)._2)
    assert(ids(4)._2 === ids(3)._2 + 1)
    assert(ids.map(_._2).distinct.length === 5)
  }

  test("routing merges shards into one target table") {
    val out = freshOut()
    val cfg = ImportConfig(
      sourceDir = fixture("mydump"),
      outDir = out,
      filter = TableFilter(doTables = Seq(("routes_b", "*"))),
      routes = Seq(RouteRule("routes_a*", "t*", "routes_b", "u")))
    val reports = new ImportPipeline(spark, cfg).run()
    assert(reports.map(_.table) === Seq("u"))
    assert(reports.head.rows === 3)
    val u = spark.read.parquet(s"$out/routes_b/u")
    assert(u.collect().map(_.getInt(0)).sorted.toSeq === Seq(1, 2, 3))
  }

  test("checkpoint-destroy: failed table's state and partial output removed, re-import clean") {
    import graft.operators.SqlMode
    val src = java.nio.file.Files.createTempDirectory("graft-destroy").toFile
    def writeCsv(name: String, body: String): Unit =
      java.nio.file.Files.writeString(new java.io.File(src, name).toPath, body)
    // good table + a table whose second chunk poisons a strict import
    writeCsv("dz.good.csv", (1 to 10).map(i => s"$i,$i.5").mkString("", "\n", "\n"))
    writeCsv("dz.bad.0001.csv", (1 to 50).map(i => s"$i,$i.5").mkString("", "\n", "\n"))
    writeCsv("dz.bad.0002.csv", "51,junk\n")
    val table = graft.sources.MysqlDdl.parseCreateTable(
      "CREATE TABLE `t` (`id` int(11) NOT NULL, `v` double, PRIMARY KEY (`id`))")
    val out = freshOut()
    def cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
      sqlMode = SqlMode.Strict, continueOnError = true,
      schemaCatalog = Map(("dz", "good") -> table, ("dz", "bad") -> table),
      chunkCommitBytes = 64)
    val first = new ImportPipeline(spark, cfg).run()
    assert(first.exists(r => r.table == "bad" && r.error.nonEmpty))
    assert(first.exists(r => r.table == "good" && r.error.isEmpty))
    val log = new graft.sinks.CommitLog(out, spark.sparkContext.hadoopConfiguration)
    // failed state recorded; partial output of chunk 1 is on disk
    assert(log.listTables().exists(s => s.table == "bad" && s.status == "failed"))
    assert(new java.io.File(s"$out/dz/bad").exists())
    // destroy every failed table (the ctl error-destroy semantics)
    log.listTables().filter(_.status == "failed")
      .foreach(s => log.destroy(s.db, s.table))
    assert(!new java.io.File(s"$out/dz/bad").exists())
    assert(log.read("dz", "bad").isEmpty && log.readChunks("dz", "bad").isEmpty)
    assert(log.read("dz", "good").nonEmpty) // untouched
    // repair the poison row and re-import: bad lands clean, good resumes
    writeCsv("dz.bad.0002.csv", "51,51.5\n")
    val second = new ImportPipeline(spark, cfg).run()
    assert(second.find(_.table == "bad").get.rows === 51)
    assert(second.find(_.table == "good").get.resumedSkip)
    assert(spark.read.parquet(s"$out/dz/bad").select("id").distinct().count() === 51)
  }

  test("per-file CSV headers: shards with permuted headers both land correctly") {
    val src = java.nio.file.Files.createTempDirectory("graft-hdr").toFile
    // shard 1: (id, v) order; shard 2: (v, id) — the reference parses each
    // file's own header (csv_parser.go:100-118); inheriting shard 1's order
    // would land shard 2's values swapped
    java.nio.file.Files.writeString(
      new java.io.File(src, "hd.t.0001.csv").toPath,
      "id,v\n1,one\n2,two\n")
    java.nio.file.Files.writeString(
      new java.io.File(src, "hd.t.0002.csv").toPath,
      "v,id\nthree,3\nfour,4\n")
    val table = graft.sources.MysqlDdl.parseCreateTable(
      "CREATE TABLE `t` (`id` int(11) NOT NULL, `v` varchar(8), PRIMARY KEY (`id`))")
    val out = freshOut()
    val cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
      schemaCatalog = Map(("hd", "t") -> table),
      csv = graft.sources.CsvConfig(header = true))
    assert(new ImportPipeline(spark, cfg).run().head.rows === 4)
    val got = spark.read.parquet(s"$out/hd/t").select("id", "v").collect()
      .map(r => (r.getInt(0), r.getString(1))).sortBy(_._1)
    assert(got.toSeq === Seq((1, "one"), (2, "two"), (3, "three"), (4, "four")))
  }

  test("explicit _tidb_rowid in file column lists routes to the row handle") {
    val src = java.nio.file.Files.createTempDirectory("graft-rowid").toFile
    // SQL shard: INSERT column list names _tidb_rowid (a dump exported
    // with -r); CSV shard: header names it. Both must take row ids FROM
    // the file (reference restore.go:1363-1406, tests/tidb_rowid/)
    java.nio.file.Files.writeString(
      new java.io.File(src, "rid.t.0001.sql").toPath,
      "INSERT INTO `t` (`id`,`v`,`_tidb_rowid`) VALUES " +
        "(1,'a',1001),(2,'b',1002);\n")
    java.nio.file.Files.writeString(
      new java.io.File(src, "rid.t.0002.csv").toPath,
      "id,_tidb_rowid,v\n3,2001,c\n4,2002,d\n")
    val table = graft.sources.MysqlDdl.parseCreateTable(
      "CREATE TABLE `t` (`id` int(11) NOT NULL, `v` varchar(8), PRIMARY KEY (`id`))")
    val out = freshOut()
    val cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
      schemaCatalog = Map(("rid", "t") -> table),
      csv = graft.sources.CsvConfig(header = true))
    val report = new ImportPipeline(spark, cfg).run().head
    assert(report.rows === 4)
    val got = spark.read.parquet(s"$out/rid/t")
      .select("id", "_row_id", "v").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getString(2))).sortBy(_._1)
    assert(got.toSeq === Seq((1, 1001L, "a"), (2, 1002L, "b"),
      (3, 2001L, "c"), (4, 2002L, "d")))
    // P8: the rebase value reflects the explicit handles
    assert(graft.operators.RowIdAllocator.nextAutoIncrement(
      spark.read.parquet(s"$out/rid/t"), "_row_id") === 2003L)
  }

  test("concurrent table restore equals sequential (reference concurrent-restore)") {
    val src = java.nio.file.Files.createTempDirectory("graft-conc").toFile
    for (t <- 1 to 6) {
      java.nio.file.Files.writeString(
        new java.io.File(src, s"cc.t$t.sql").toPath,
        (1 to 40).map(i => s"INSERT INTO `t$t` VALUES ($i,'v${t}_$i');")
          .mkString("", "\n", "\n"))
    }
    val table = graft.sources.MysqlDdl.parseCreateTable(
      "CREATE TABLE `t` (`id` int(11) NOT NULL, `v` varchar(16), PRIMARY KEY (`id`))")
    val catalog = (1 to 6).map(t => ("cc", s"t$t") -> table).toMap
    def runWith(conc: Int): (Seq[(String, Long, Long)], String) = {
      val out = freshOut()
      val cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
        schemaCatalog = catalog, tableConcurrency = conc)
      val reports = new ImportPipeline(spark, cfg).run()
      (reports.map(r => (r.table, r.rows, r.dataChecksum)), out)
    }
    val (seq, _) = runWith(1)
    val (par, out) = runWith(4)
    assert(par === seq) // same tables, same order, same checksums
    assert(par.forall(_._2 === 40))
    assert(spark.read.parquet(s"$out/cc/t3").count() === 40)
  }

  test("csv table lands with lenient casts applied") {
    val out = freshOut()
    val cfg = ImportConfig(
      sourceDir = fixture("mydump"),
      outDir = out,
      filter = TableFilter(doTables = Seq(("mdb", "people"))),
      csv = graft.sources.CsvConfig(multiLine = true))
    new ImportPipeline(spark, cfg).run()
    val ppl = spark.read.parquet(s"$out/mdb/people")
    val bob = ppl.filter("id = 2").collect()(0)
    assert(bob.getString(1) === "Bob \"the builder\"")
    assert(bob.isNullAt(2)) // \N age
    assert(bob.getAs[java.math.BigDecimal]("balance").doubleValue() === -7.25)
    val joined = bob.getAs[java.time.LocalDateTime]("joined")
    assert(joined.toString.startsWith("2021-06-07T08:09:10.123456"))
  }
}
