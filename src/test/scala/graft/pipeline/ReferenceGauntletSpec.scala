package graft.pipeline

import java.io.File
import graft.SparkSpec
import graft.sources.TableFilter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's own integration fixtures, imported end-to-end, checked
  * against the exact numbers its run.sh scripts assert (pre-rebase state —
  * the parquet sink analog of "SELECT ... after lightning finishes").
  * Read-only from the reference checkout; skipped when absent. */
class ReferenceGauntletSpec extends SparkSpec {

  private val refTests = new File("/root/reference/tests")

  private def imported(scenario: String, db: String): String = {
    val out = new File(s"target/test_refgauntlet/$scenario").getAbsolutePath
    val cfg = ImportConfig(
      sourceDir = new File(refTests, s"$scenario/data").getAbsolutePath,
      outDir = out,
      filter = TableFilter(doTables = Seq((db, "*"))),
      checkpointEnabled = false)
    new ImportPipeline(spark, cfg).run()
    out
  }

  private def tbl(out: String, db: String, table: String): DataFrame =
    spark.read.parquet(s"$out/$db/$table")

  test("tool_135: five auto-increment tables match the reference sums") {
    assume(refTests.isDirectory)
    val out = imported("tool_135", "tool_135")
    // (table, col -> (count, sum, min, max)) straight from run.sh
    val expect = Seq(
      ("bar1", "a", (1000L, 601500L, 102L, 1101L)),
      ("bar2", "a", (1000L, 548500L, 49L, 1048L)),
      ("bar3", "a", (1000L, 532218793L, 1071L, 1048054L)),
      ("bar3", "b", (1000L, 645500L, 146L, 1145L)),
      ("bar4", "a", (1000L, 588500L, 89L, 1088L)),
      ("bar5", "a", (1000L, 534846115L, 970L, 1045357L)),
      ("bar5", "b", (1000L, 563500L, 64L, 1063L)))
    for ((t, c, (n, s, mn, mx)) <- expect) {
      val r = tbl(out, "tool_135", t).agg(
        count(col(c)), sum(col(c)).cast("long"),
        min(col(c)).cast("long"), max(col(c)).cast("long")).collect()(0)
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
        ((n, s, mn, mx)), s"$t.$c")
    }
  }

  test("tool_1420: reserved-ish table name pt_role imports its one row") {
    assume(refTests.isDirectory)
    val out = imported("tool_1420", "EE1420")
    val rows = tbl(out, "EE1420", "pt_role").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("1"))
  }

  test("tool_241: zero-byte data file -> empty table; unsigned ints + zero-date defaults parse") {
    assume(refTests.isDirectory)
    val out = imported("tool_241", "qyjc")
    val fish = tbl(out, "qyjc", "q_fish_event")
    val r = fish.agg(count(col("id")), min(col("id")).cast("long"),
      max(col("id")).cast("long")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((84L, 8343146L, 8343229L)))
    // the reference creates q_alarm_group from a 0-byte shard: empty, not a crash
    assert(tbl(out, "qyjc", "q_alarm_group").count() === 0L)
  }

  test("tool_1472: multi-shard tiny tables; auto-inc column on a non-pk table") {
    assume(refTests.isDirectory)
    val out = imported("tool_1472", "EE1472")
    assert(tbl(out, "EE1472", "pk").select("a").collect()
      .map(_.getByte(0).toInt).sorted.toSeq === Seq(3, 4))
    assert(tbl(out, "EE1472", "notpk").select("a", "b").collect()
      .map(r => (r.getInt(0), r.getByte(1).toInt)).sortBy(_._1).toSeq ===
      Seq((1111, 6), (2222, 9)))
  }

  test("partitioned-table: PARTITION BY clause tolerated, data lands whole") {
    assume(refTests.isDirectory)
    val out = imported("partitioned-table", "partitioned")
    val r = tbl(out, "partitioned", "a")
      .agg(count(lit(1)), sum(col("a")).cast("long")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((7L, 277151781L)))
  }

  test("default-columns: empty tuples fill defaults; auto-inc synthesis on missing columns") {
    assume(refTests.isDirectory)
    val out = imported("default-columns", "defcol")
    val t = tbl(out, "defcol", "t")
    assert(t.count() === 9L)
    assert(t.agg(min(col("pk"))).collect()(0).getInt(0) === 1)
    assert(t.filter(col("x").isNotNull || col("y") =!= 123 ||
      col("z").isNull).count() === 0L, "x default NULL, y default 123, z default now()")
    val u = tbl(out, "defcol", "u").select("xx", "yy").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sortBy(_._2)
    assert(u.toSeq === Seq((1, 40), (2, 60)))
  }

  test("various_types: the reference's exotic-PK round-trip matrix") {
    assume(refTests.isDirectory)
    val out = imported("various_types", "vt")
    // bit: BIT(2) → LongType 0..3
    val bit = tbl(out, "vt", "bit")
    assert(bit.count() === 16L)
    val bitR = bit.agg(min(col("pk")), max(col("pk"))).collect()(0)
    assert((bitR.getLong(0), bitR.getLong(1)) === ((0L, 3L)))
    assert(bit.filter(col("pk") === 2).agg(sum(col("ref"))).collect()(0)
      .getLong(0) === 82L)
    // decimal: DECIMAL(6,4)-ish pk
    val dec = tbl(out, "vt", "decimal")
    val decR = dec.agg(count(col("pk")), min(col("pk")).cast("string"),
      max(col("pk")).cast("string"), sum(col("pk")).cast("string")).collect()(0)
    assert(decR.getLong(0) === 50L)
    assert(decR.getString(1) === "-99.9990")
    assert(decR.getString(2) === "99.9912")
    assert(decR.getString(3) === "-9.9123")
    assert(dec.filter(col("pk").between(-1.0, 0.0)).select("ref")
      .collect().map(_.getInt(0)).toSeq === Seq(22))
    // double: full-range doubles as keys
    val dbl = tbl(out, "vt", "double")
    val dblR = dbl.agg(count(col("pk")), min(col("pk")), max(col("pk"))).collect()(0)
    assert(dblR.getLong(0) === 41L)
    assert(dblR.getDouble(1) === 9.85967654375977e-305)
    assert(dblR.getDouble(2) === 1.0142320547350045e304)
    assert(dbl.filter(col("pk").between(1e100, 1e120)).select("ref")
      .collect().map(_.getInt(0)).toSeq === Seq(245))
    // datetime: DATETIME(6) spans years 1026..9889 (NTZ — no tz ambiguity)
    val dt = tbl(out, "vt", "datetime")
    val dtR = dt.agg(count(col("pk")), min(col("pk")).cast("string"),
      max(col("pk")).cast("string"), countDistinct(col("uk"))).collect()(0)
    assert(dtR.getLong(0) === 70L)
    assert(dtR.getString(1) === "1026-09-21 15:15:54.335745")
    assert(dtR.getString(2) === "9889-01-08 08:51:03.389832")
    assert(dtR.getLong(3) === 70L) // unique key stays unique
    assert(dt.filter(col("pk").between("2882-01-01", "2882-12-31"))
      .select("ref").collect().map(_.getInt(0)).toSeq === Seq(7))
    // char + binary: uuid keys, text and bytes
    val ch = tbl(out, "vt", "char")
    val chR = ch.agg(count(col("pk")), min(col("pk")), max(col("pk"))).collect()(0)
    assert(chR.getLong(0) === 50L)
    assert(chR.getString(1) === "090abbb2-f22e-4f97-a4fe-a52eb1a80a0b")
    assert(chR.getString(2) === "fde1328c-409c-43a8-b1b0-8c35c8000f92")
    assert(ch.filter(col("pk") === "55dc0343-db6a-4208-9872-9096305b8c07")
      .select("ref").collect().map(_.getInt(0)).toSeq === Seq(41))
    val bin = tbl(out, "vt", "binary")
    assert(bin.count() === 50L)
    assert(bin.agg(min(hex(col("pk"))), max(hex(col("pk")))).collect()(0)
      .toSeq === Seq("090ABBB2F22E4F97A4FEA52EB1A80A0B",
        "FDE1328C409C43A8B1B08C35C8000F92"))
    // json: stored as string, values distinct, structure preserved
    val js = tbl(out, "vt", "json")
    val jsR = js.agg(count(col("pk")), countDistinct(col("js"))).collect()(0)
    assert((jsR.getLong(0), jsR.getLong(1)) === ((92L, 92L)))
    assert(js.filter(col("js") === "[1, 2, 3]").select("pk")
      .collect().map(_.getInt(0)).toSeq === Seq(1089))
    val js2000 = js.filter(col("pk") === 2000).collect()(0).getString(1)
    assert(js2000.startsWith("{") && js2000.contains("\"52\": 1") &&
      js2000.contains("\"126\": 1"))
    // enum-set: 256-member ENUM + 64-member SET, stored in declared order
    val es = tbl(out, "vt", "enum-set")
    assert(es.count() === 26L)
    assert(es.filter(array_contains(split(col("set"), ","), "x50"))
      .count() === 10L)
    assert(es.filter(col("enum") === "gcc").select("set").collect()(0)
      .getString(0) ===
      "x00,x06,x07,x09,x17,x20,x23,x24,x27,x37,x44,x46,x49,x54,x55,x58,x61,x62")
    assert(es.filter(col("enum") === "g99").select("set").collect()(0)
      .getString(0) ===
      "x07,x08,x09,x10,x11,x12,x14,x16,x17,x18,x19,x22,x25,x26,x28,x29,x30," +
      "x31,x32,x33,x35,x38,x39,x41,x44,x46,x49,x51,x53,x55,x56,x58,x61,x63")
    // empty_strings: the quote-unescape matrix ('' "" \" \' 0x22 0x27)
    val emp = tbl(out, "vt", "empty_strings")
    assert(emp.count() === 6L)
    def pkSum(cond: org.apache.spark.sql.Column) =
      emp.filter(cond).agg(sum(col("pk"))).collect()(0).getLong(0)
    assert(pkSum(col("a") === "") === 5L)
    assert(pkSum(col("a") === "\"") === 18L)
    assert(pkSum(col("a") === "'") === 40L)
    // precise_types: u64 max-ish, i64 min-ish, DECIMAL(21,1), DOUBLE
    val pt = tbl(out, "vt", "precise_types").collect()(0)
    assert(pt.getDecimal(0).toString === "18446744073709551614")
    assert(pt.getLong(1) === -9223372036854775806L)
    assert(pt.getDecimal(2).toString === "99999999999999999999.0")
    assert(pt.getDouble(3) === math.pow(2, 64))
  }

  test("character_sets: gb18030/utf8mb4/mixed dumps under auto, named, and binary charsets") {
    assume(refTests.isDirectory)
    def run(sub: String, charset: String, tag: String): String = {
      val out = new File(s"target/test_refgauntlet/charsets_$tag").getAbsolutePath
      val cfg = ImportConfig(
        sourceDir = new File(refTests, s"character_sets/$sub").getAbsolutePath,
        outDir = out, charset = charset,
        filter = TableFilter(doTables = Seq(("charsets", "*"))),
        checkpointEnabled = false)
      new ImportPipeline(spark, cfg).run()
      out
    }
    def sumFirst(out: String, table: String): Long = {
      val df = spark.read.parquet(s"$out/charsets/$table")
      df.agg(sum(col(df.columns.head))).collect()(0).getLong(0)
    }
    // gb18030 dump: auto-detect and explicit gb18030 both decode 主键
    val gAuto = run("gb18030", "auto", "g_auto")
    assert(spark.read.parquet(s"$gAuto/charsets/gb18030").columns.head === "主键")
    assert(sumFirst(gAuto, "gb18030") === 267L)
    assert(sumFirst(run("gb18030", "GB18030", "g_named"), "gb18030") === 267L)
    // binary passthrough: bytes kept as-is → latin1-mojibake column name,
    // values still sum (run.sh asserts sum(`Ö÷¼ü`) = 267)
    val gBin = run("gb18030", "binary", "g_bin")
    assert(spark.read.parquet(s"$gBin/charsets/gb18030").columns.head === "Ö÷¼ü")
    assert(sumFirst(gBin, "gb18030") === 267L)
    // utf8mb4 dump under auto
    assert(sumFirst(run("utf8mb4", "auto", "u_auto"), "utf8mb4") === 1119L)
    // mixed-charset dump: only binary passthrough imports it
    assert(sumFirst(run("mixed", "binary", "m_bin"), "mixed") === 5291L)
  }

  test("exotic_filenames: backticked/CJK names, explicit _tidb_rowid, rebase") {
    assume(refTests.isDirectory)
    // the reference's run.sh builds the dump at runtime by renaming the
    // fixtures to their exotic spellings (git can't hold them portably) —
    // do the same under target/
    val src = new File(refTests, "exotic_filenames/data")
    val dump = new File("target/test_refgauntlet/exotic_dump")
    dump.mkdirs()
    val renames = Seq(
      "zwk-schema-create.sql" -> "中文庫-schema-create.sql",
      "zwk.zwb-schema.sql" -> "中文庫.中文表-schema.sql",
      "zwk.zwb.sql" -> "中文庫.中文表.sql",
      "xfn-schema-create.sql" -> "x`f\"n-schema-create.sql",
      "xfn.etn-schema.sql" -> "x`f\"n.exotic`table``name-schema.sql",
      "xfn.etn.sql" -> "x`f\"n.exotic`table``name.sql")
    for ((from, to) <- renames)
      java.nio.file.Files.copy(new File(src, from).toPath,
        new File(dump, to).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val out = new File("target/test_refgauntlet/exotic_out").getAbsolutePath
    val cfg = ImportConfig(sourceDir = dump.getAbsolutePath, outDir = out,
      checkpointEnabled = false)
    val reports = new ImportPipeline(spark, cfg).run()
    assert(reports.size === 2, reports.map(r => s"${r.db}.${r.table}"))
    // x`f"n.exotic`table``name: lowercase `insert` without INTO, doubled
    // backticks in the DDL name, explicit _tidb_rowid column values, and
    // AUTO_INCREMENT=80000 (run.sh: 5 rows; new allocations land >= 80000)
    val et = tbl(out, "x`f\"n", "exotic`table``name")
    assert(et.count() === 5L)
    assert(et.select("a").collect().map(_.getString(0)).sorted.toSeq ===
      Seq("aaaaaa", "bbbbbb", "cccccc", "dddddd", "eeeeee"))
    assert(et.agg(sum(col("b"))).collect()(0).getLong(0) === 165L)
    // explicit rowids are preserved verbatim (P4 routing)
    assert(et.select("_row_id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(79995L, 79996L, 79997L, 79998L, 79999L))
    // P8 rebase: the next allocation clears every imported rowid (run.sh
    // inserts two rows post-import and asserts both land above 80000)
    assert(graft.operators.RowIdAllocator.nextAutoIncrement(et, "_row_id")
      >= 80000L)
    // 中文庫.中文表: bare CJK identifier, no space before the column list
    val zw = tbl(out, "中文庫", "中文表")
    assert(zw.select("a").collect().map(_.getInt(0)).toSeq === Seq(2345))
  }

  test("examples: the 10k-row mocker_test dump across the read-block-size sweep") {
    assume(refTests.isDirectory)
    val srcDir = new File("/root/reference/lightning/mydump/examples")
    assume(srcDir.isDirectory)
    // run.sh renames mocker_test.i → mocker_test.ı at runtime (the schema
    // inside declares `ı`; JENKINS-45544 keeps the checked-in name ASCII)
    val dump = new File("target/test_refgauntlet/examples_dump")
    dump.mkdirs()
    // the mydumper `metadata` file is copied too — discovery must classify
    // it as non-data, not trip over it
    for (f <- srcDir.listFiles()) {
      val to = f.getName.replace("mocker_test.i-schema", "mocker_test.ı-schema")
        .replace("mocker_test.i.sql", "mocker_test.ı.sql")
      java.nio.file.Files.copy(f.toPath, new File(dump, to).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    // the three read-block-size tomls (1 B / 512 B / 128 KiB), loaded
    // VERBATIM through the TOML adapter — results must be chunking-
    // invariant (the reference runs the same sweep)
    for (tomlName <- Seq("512", "1", "131072")) {
      val loaded = graft.config.TomlImportConfig.load(
        java.nio.file.Files.readString(
          new File(refTests, s"examples/$tomlName.toml").toPath))
      assert(loaded.config.minChunkBytes === tomlName.toLong)
      assert(loaded.warnings.exists(_.contains("lightning.level")))
      val out = new File(
        s"target/test_refgauntlet/examples_out_$tomlName").getAbsolutePath
      val cfg = loaded.config.copy(sourceDir = dump.getAbsolutePath,
        outDir = out, checkpointEnabled = false)
      val reports = new ImportPipeline(spark, cfg).run()
      assert(reports.size === 4, reports.map(r => r.table))
      val auto = tbl(out, "mocker_test", "tbl_autoid")
      val a = auto.agg(count(lit(1)), countDistinct(col("id")),
        sum(col("id")).cast("long"), max(col("name")), min(col("name")),
        sum(crc32(col("name"))).cast("long")).collect()(0)
      assert((a.getLong(0), a.getLong(1), a.getLong(2)) ===
        ((10000L, 10000L, 50005000L)))
      assert((a.getString(3), a.getString(4)) === (("4-9-9", "0-0-0")))
      assert(a.getLong(5) === 21388950023608L) // sum(crc32(name)), run.sh
      if (tomlName == "512") { // full matrix once; sweep pins invariance
        // AUTO_INCREMENT: the next id allocation must clear 10000
        assert(graft.operators.RowIdAllocator.nextAutoIncrement(
          auto, "_row_id") > 10000L)
        val multi = tbl(out, "mocker_test", "tbl_multi_index")
        val m = multi.agg(count(lit(1)), avg(col("age")),
          max(col("name")), min(col("name")),
          sum(crc32(col("name"))).cast("long")).collect()(0)
        assert(m.getLong(0) === 10000L)
        assert(math.abs(m.getDouble(1) - 477.75) < 1e-9)
        assert((m.getString(2), m.getString(3)) === (("4+9+9", "0+0+0")))
        assert(m.getLong(4) === 21433704622808L)
        assert(multi.filter(col("name") === "1+2+3")
          .select(col("age").cast("long"))
          .collect().map(_.getLong(0)).toSeq === Seq(6L))
        assert(multi.filter(col("age") === 6).count() === 20L)
        // the unicode table: ı declares column ſ holding 🤪 (the dump's
        // ToUpper-index trap); and the single-row report table
        val i = tbl(out, "mocker_test", "ı")
        assert(i.schema.fieldNames.contains("ſ"))
        assert(i.select(col("ſ")).collect().map(_.getString(0)).toSeq ===
          Seq("🤪"))
        val rep = tbl(out, "mocker_test", "report_case_high_risk")
          .selectExpr("CAST(id AS BIGINT)", "CAST(total_case AS BIGINT)",
            "CAST(today_new_case AS BIGINT)", "report_data", "caseType")
          .collect()
        assert(rep.length === 1)
        assert((rep(0).getLong(0), rep(0).getLong(1), rep(0).getLong(2),
          rep(0).getString(3), rep(0).getString(4)) ===
          ((2L, 8L, 10L, "4", "6")))
      }
    }
  }

  test("black-white-list: db and table filter matrices") {
    assume(refTests.isDirectory)
    def run(tag: String, filter: TableFilter): Set[String] = {
      val out = new File(s"target/test_refgauntlet/bwl_$tag").getAbsolutePath
      val cfg = ImportConfig(
        sourceDir = new File(refTests, "black-white-list/data").getAbsolutePath,
        outDir = out, filter = filter, checkpointEnabled = false)
      new ImportPipeline(spark, cfg).run().map(r => s"${r.db}.${r.table}").toSet
    }
    assert(run("firstdb", TableFilter(doTables = Seq(("firstdb", "*")))) ===
      Set("firstdb.first", "firstdb.second"))
    assert(run("even", TableFilter(doTables =
      Seq(("firstdb", "second"), ("seconddb", "fourth")))) ===
      Set("firstdb.second", "seconddb.fourth"))
  }

  test("csv: the reference's escape/null/binary CSV matrix") {
    assume(refTests.isDirectory)
    val out = new File("target/test_refgauntlet/csv").getAbsolutePath
    val cfg = ImportConfig(
      sourceDir = new File(refTests, "csv/data").getAbsolutePath,
      outDir = out,
      // the scenario's config.toml: ',' separator, '"' quote, no header,
      // \N nulls, backslash-escape; binary charset keeps the escapes
      // table's raw 0xFF bytes byte-transparent; multiLine for the
      // quoted-CRLF field in escapes row 2
      csv = graft.sources.CsvConfig(backslashEscape = true,
        charset = "binary", multiLine = true),
      charset = "binary",
      filter = TableFilter(doTables = Seq(("csv", "*"))),
      checkpointEnabled = false)
    new ImportPipeline(spark, cfg).run()
    val threads = tbl(out, "csv", "threads")
    val r = threads.agg(count(lit(1)),
      sum(col("PROCESSLIST_TIME")).cast("long"),
      sum(col("THREAD_OS_ID")).cast("long"),
      count(col("PROCESSLIST_STATE"))).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((43L, 322253L, 303775702L, 3L)))
    assert(threads.filter(col("PROCESSLIST_TIME").isNotNull).count() === 12L)
    val esc = tbl(out, "csv", "escapes").collect()
      .map(row => row.getInt(0) -> row).toMap
    def hexOf(row: org.apache.spark.sql.Row, i: Int): String =
      row.getAs[Array[Byte]](i).map("%02X".format(_)).mkString
    assert(esc(1).getString(1) === "\\")
    assert(esc(1).getString(2) === "{\"?\": []}")
    assert(hexOf(esc(1), 3) === "FFFFFFFF")
    assert(esc(2).getString(1) === "\"")
    assert(esc(2).getString(2) === "\"\\n\\n\\n\"")
    // PINNED DEVIATION (README "Known deviations"): Lightning drops the
    // backslash of UNKNOWN escapes (`\<LF>` → LF); univocity — required
    // for quoted embedded newlines — passes `\x` through untouched for
    // x outside {quote, escape}. The reference expects 0D0A0D0A / LF.
    assert(hexOf(esc(2), 3) === "0D5C0A0D5C0A")
    assert(esc(3).getString(1) === "\\\n")
    assert(esc(3).getString(2) === "[\",,,\"]")
    assert(hexOf(esc(3), 3) === "5C2C5C2C")
    // empty_strings: b is '' for every row (quoted-empty, bare-empty,
    // trailing-empty forms all agree)
    assert(tbl(out, "csv", "empty_strings")
      .filter(col("b") =!= "").count() === 0L)
  }

  test("row-format-v2: 150-column wide rows with null tails") {
    assume(refTests.isDirectory)
    val out = imported("row-format-v2", "rowformatv2")
    val t1 = tbl(out, "rowformatv2", "t1")
    assert(t1.count() === 50L)
    val col14 = t1.select("col14").distinct().collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSet
    assert(col14.contains(None) && col14.contains(Some(39)))
  }

  test("no_schema: schema-only dir imports nothing; data lands in the pre-declared table") {
    assume(refTests.isDirectory)
    // phase 1 (run.sh:19-21): --no-schema over a dir holding ONLY schema
    // files — nothing may be imported, the `noschema` db must not appear
    val out = java.nio.file.Files
      .createTempDirectory("graft-noschema").toString
    val cfg1 = ImportConfig(
      sourceDir = new File(refTests, "no_schema/schema-data").getAbsolutePath,
      outDir = out, noSchema = true,
      filter = TableFilter(doTables = Seq(("noschema", "*"))),
      checkpointEnabled = false)
    assert(new ImportPipeline(spark, cfg1).run().isEmpty)
    assert(!new File(out, "noschema").exists(), "no-schema run created the db")
    // phase 2 (run.sh:23-30): the operator pre-creates noschema.t, then the
    // dump's data files import into it — graft's no-schema catalog stands
    // in for the pre-created target table
    val cfg2 = cfg1.copy(
      sourceDir = new File(refTests, "no_schema/data").getAbsolutePath,
      schemaCatalog = Map(("noschema", "t") ->
        graft.sources.MysqlDdl.parseCreateTable(
          "create table `t` (`x` int primary key)")))
    assert(new ImportPipeline(spark, cfg2).run().head.rows === 15L)
    val total = tbl(out, "noschema", "t").agg(sum(col("x")).cast("long"))
      .collect()(0).getLong(0)
    assert(total === 120L, "run.sh asserts sum(x)=120 over 1..15")
  }

  test("error_summary: two failing tables summarized with names, the good one lands") {
    assume(refTests.isDirectory)
    import graft.sinks.{JdbcSink, OnDuplicate}
    // run.sh induces per-table failure at the target (conflicting
    // prepopulated rows → checksum mismatch); the fake target's poison
    // seam plays the same role: writes to a and c fail non-retryably
    FakeSqlTarget.reset(
      poison = Set("error_summary.a", "error_summary.c"))
    val out = java.nio.file.Files.createTempDirectory("graft-esum").toString
    val cfg = ImportConfig(
      sourceDir = new File(refTests, "error_summary/data").getAbsolutePath,
      outDir = out,
      filter = TableFilter(doTables = Seq(("error_summary", "*"))),
      continueOnError = true, checkpointEnabled = false)
    val sink = new JdbcSink("jdbc:fake", new java.util.Properties(),
      OnDuplicate.Replace, maxRetries = 0,
      connFactory = Some(() => FakeSqlTarget.connection()))
    val reports = new ImportPipeline(spark, cfg, sink = Some(sink)).run()
    // run.sh: '["tables failed to be imported"] [count=2]' naming a and c
    val failed = reports.filter(_.error.nonEmpty).map(_.table).toSet
    assert(failed === Set("a", "c"), s"summary: $reports")
    // run.sh: b imported — sum(id)=28, sum(k)=32
    val b = FakeSqlTarget.rowsOf("error_summary.b")
    assert(b.keys.sum === 28L)
    assert(b.values.map(_.toLong).sum === 32L)
  }

  test("checkpoint_engines: killed at every chunk boundary, converges " +
      "exactly-once; final rerun is a no-op") {
    // reference run.sh kills the import once per engine (6 engines over
    // cpeng.a/b, via failpoints at engine status transitions) and asserts
    // convergence + a checkpoint no-op rerun. The Spark analog of engine
    // granularity is the chunk group (one per data file at
    // chunkCommitBytes=16), and the kill is the pipeline's pause/cancel
    // gate, which fires between job submissions — a canceled import
    // resumes exactly like a crashed one, from committed chunk states.
    // cpeng.a is KEYLESS, so the JDBC/REPLACE sink would refuse chunk
    // checkpoints (replay not idempotent); the parquet sink's staged
    // append + reconcile gives exactly-once regardless.
    assume(refTests.isDirectory)
    val out = java.nio.file.Files.createTempDirectory("graft-cpeng").toString
    def cfg = ImportConfig(
      sourceDir = new File(refTests, "checkpoint_engines/data").getAbsolutePath,
      outDir = out,
      filter = TableFilter(doTables = Seq(("cpeng", "*"))),
      chunkCommitBytes = 16,
      tableConcurrency = 1) // deterministic kill points, like the reference
    var kills = 0
    var sawChunkState = false
    for (killAfter <- 1 to 5) {
      val n = new java.util.concurrent.atomic.AtomicInteger()
      try new ImportPipeline(spark, cfg,
        cancelled = () => n.incrementAndGet() > killAfter).run()
      catch { case _: Throwable =>
        kills += 1
        val st = new File(out, "_state").listFiles()
        if (st != null && st.exists(_.getName.contains(".chunk.")))
          sawChunkState = true
      }
    }
    assert(kills >= 3, s"the cancel gate killed only $kills of 5 runs")
    assert(sawChunkState, "no chunk state survived a killed run")
    val reports = new ImportPipeline(spark, cfg).run()
    assert(reports.map(_.rows).sum === 8)
    // run.sh probes: count 4 / sum 10 for a, count 4 / sum 46 for b — and
    // chunk-granular resume must land every row exactly ONCE in the sink
    def landed(table: String): Seq[Int] =
      spark.read.parquet(s"$out/cpeng/$table")
        .select("c").collect().map(_.getInt(0)).sorted.toSeq
    assert(landed("a") === Seq(1, 2, 3, 4))
    assert(landed("a").sum === 10)
    assert(landed("b") === Seq(10, 11, 12, 13))
    assert(landed("b").sum === 46)
    // "Verify checkpoint no-op": the rerun re-imports nothing
    val again = new ImportPipeline(spark, cfg).run()
    assert(again.forall(_.resumedSkip))
  }

  test("routes: wildcard shard-merge routing end-to-end (run.sh sums)") {
    // reference tests/routes: routes_a*.t* all merge into routes_b.u
    // (4 rows summing 259 across two schemas and three tables); s1 does
    // NOT match the table pattern and stays put; nothing may be left
    // under the matched-away names
    assume(refTests.isDirectory)
    val out = new File("target/test_refgauntlet/routes_out").getAbsolutePath
    val cfg = ImportConfig(
      sourceDir = new File(refTests, "routes/data").getAbsolutePath,
      outDir = out,
      routes = Seq(graft.sources.RouteRule("routes_a*", "t*",
        "routes_b", "u")),
      checkpointEnabled = false)
    val reports = new ImportPipeline(spark, cfg).run()
    val u = tbl(out, "routes_b", "u")
    val r = u.agg(count(lit(1)), sum(col("x")).cast("long")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((4L, 259L)))
    val s1 = tbl(out, "routes_a1", "s1")
      .agg(count(lit(1)), sum(col("x")).cast("long")).collect()(0)
    assert((s1.getLong(0), s1.getLong(1)) === ((1L, 1296L)))
    // SHOW TABLES IN routes_a1 must not contain t2; routes_a0 is empty
    assert(!new File(s"$out/routes_a1/t2").exists())
    assert(!new File(s"$out/routes_a0").exists())
    assert(reports.map(t => s"${t.db}.${t.table}").toSet ===
      Set("routes_b.u", "routes_a1.s1"))
  }

  test("checkpoint: nine index-shape tables, killed after each table " +
      "import, converge exactly-once; no-op rerun") {
    // reference tests/checkpoint/run.sh: 9 tables (each with a different
    // index clause) x 50 two-row INSERT files, a failpoint kills lightning
    // as soon as ONE table is imported — "if checkpoint does work, this
    // should only kill 9 instances" — then a final run is a no-op and the
    // global sum probe matches. The kill analog: a cancel gate that fires
    // once the commit log records one MORE imported table than the run
    // started with (the kill-after-one-import semantics, driven from the
    // same state the reference's failpoint guards).
    val tableCount = 9
    val chunkCount = 50
    val src = java.nio.file.Files.createTempDirectory("graft-cppk").toFile
    java.nio.file.Files.writeString(
      new File(src, "cppk_tsr-schema-create.sql").toPath,
      "CREATE DATABASE cppk_tsr;")
    val indices = Map(1 -> "PRIMARY KEY", 2 -> "UNIQUE", 3 -> ", INDEX(j)",
      4 -> ", PRIMARY KEY(i, j)", 5 -> ", UNIQUE KEY(j)",
      6 -> ", PRIMARY KEY(j)").withDefaultValue("")
    for (i <- 1 to tableCount) {
      java.nio.file.Files.writeString(
        new File(src, s"cppk_tsr.tbl$i-schema.sql").toPath,
        s"CREATE TABLE tbl$i(i TINYINT, j INT ${indices(i)});")
      for (j <- 1 to chunkCount)
        java.nio.file.Files.writeString(
          new File(src, s"cppk_tsr.tbl$i.$j.sql").toPath,
          s"INSERT INTO tbl$i VALUES ($i,${j}000),($i,${j}001);")
    }
    val out = java.nio.file.Files.createTempDirectory("graft-cppk-out").toString
    val log = new graft.sinks.CommitLog(out,
      spark.sparkContext.hadoopConfiguration)
    def cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
      filter = TableFilter(doTables = Seq(("cppk_tsr", "*"))),
      smallTableBytes = 0, // per-table granularity, like the reference
      tableConcurrency = 1)
    def importedCount = log.listTables().count(_.status == "imported")
    for (step <- 1 to tableCount) {
      val before = importedCount
      try {
        new ImportPipeline(spark, cfg,
          cancelled = () => importedCount > before).run()
        fail(s"step $step: the kill gate never fired")
      } catch { case _: Throwable => () }
      assert(importedCount === before + 1,
        s"step $step: expected exactly one new imported table")
    }
    // "Verify checkpoint no-op": everything already imported
    val fin = new ImportPipeline(spark, cfg).run()
    assert(fin.size === tableCount && fin.forall(_.resumedSkip))
    // the run.sh sum probe: SELECT sum(j) over all 9 tables
    val total = (1 to tableCount).map { i =>
      tbl(out, "cppk_tsr", s"tbl$i")
        .agg(sum(col("j"))).collect()(0).getLong(0)
    }.sum
    assert(total === (1000L * chunkCount + 1001L) * chunkCount * tableCount)
    for (i <- 1 to tableCount)
      assert(tbl(out, "cppk_tsr", s"tbl$i").count() === 2L * chunkCount, s"tbl$i")
  }

  test("checkpoint_error_destroy: failed strict imports destroyed clean " +
      "each round, then good data lands (file + jdbc checkpoint drivers)") {
    // reference run.sh: 8× (import bad-data [timestamp '1111-11-11' is
    // outside the TIMESTAMP range → fails] then ctl
    // -checkpoint-error-destroy=all), then good-data imports and
    // SELECT shows x: 1999-09-09 09:09:09 — on both checkpoint drivers
    assume(refTests.isDirectory)
    import graft.operators.SqlMode
    import graft.sinks.{CheckpointStore, CommitLog, JdbcCheckpointStore}
    for ((tag, url) <- Seq(
        ("file", None),
        ("mysql", Some("jdbc:derby:memory:cped_ctl;create=true")))) {
      val out = java.nio.file.Files
        .createTempDirectory(s"graft-cped-$tag").toString
      def cfg(data: String) = ImportConfig(
        sourceDir = new File(refTests,
          s"checkpoint_error_destroy/$data").getAbsolutePath,
        outDir = out,
        filter = TableFilter(doTables = Seq(("cped", "*"))),
        sqlMode = SqlMode.Strict,
        continueOnError = true,
        checkpointUrl = url)
      val log: CheckpointStore = url match {
        case Some(u) => new JdbcCheckpointStore(u, new java.util.Properties(),
          out, spark.sparkContext.hadoopConfiguration)
        case None => new CommitLog(out, spark.sparkContext.hadoopConfiguration)
      }
      // 8 rounds on the file driver (the reference's loop — proves destroy
      // never exhausts anything); 2 on jdbc (driver parity, not endurance)
      val iters = if (tag == "file") 8 else 2
      for (i <- 1 to iters) {
        val r = new ImportPipeline(spark, cfg("bad-data")).run()
        assert(r.head.error.nonEmpty, s"[$tag #$i] bad data must fail")
        val failed = log.listTables().filter(_.status == "failed")
        assert(failed.map(s => (s.db, s.table)) === Seq(("cped", "t")))
        failed.foreach(s => log.destroy(s.db, s.table))
        assert(log.read("cped", "t").isEmpty, s"[$tag #$i] checkpoint kept")
        assert(!new File(s"$out/cped/t").exists(),
          s"[$tag #$i] partial output kept")
      }
      val good = new ImportPipeline(spark, cfg("good-data")).run().head
      assert(good.error.isEmpty && good.rows === 1L, s"[$tag] $good")
      val x = tbl(out, "cped", "t")
        .select(date_format(col("x"), "yyyy-MM-dd HH:mm:ss")).collect()
        .map(_.getString(0)).toSeq
      assert(x === Seq("1999-09-09 09:09:09"), s"[$tag]")
    }
  }

  test("tidb_rowid: the reference's four-case rowid matrix") {
    assume(refTests.isDirectory)
    val srcDir = new File(refTests, "tidb_rowid/data")
    val out = imported("tidb_rowid", "rowid")
    def ddl(name: String) = graft.sources.MysqlDdl.parseCreateTable(
      java.nio.file.Files.readString(
        new File(srcDir, s"rowid.$name-schema.sql").toPath))
    import graft.operators.RowIdAllocator.nextAutoIncrement
    // non_pk_auto_inc: string PK → hidden rowid synthesized 1..22 in file
    // order; the auto-inc `id` column's explicit values land verbatim.
    // run.sh: count 22, max(id) 37, rowid [1,22]; post-import inserts get
    // id > 37 and rowid > 22
    val npai = tbl(out, "rowid", "non_pk_auto_inc")
    val r1 = npai.agg(count(lit(1)), max(col("id")).cast("long"),
      min(col("_row_id")), max(col("_row_id"))).collect()(0)
    assert((r1.getLong(0), r1.getLong(1), r1.getLong(2), r1.getLong(3)) ===
      ((22L, 37L, 1L, 22L)))
    assert(nextAutoIncrement(npai, "id", ddl("non_pk_auto_inc")) > 37L)
    assert(nextAutoIncrement(npai, "_row_id", ddl("non_pk_auto_inc")) > 22L)
    // non_pk (synthesized in statement order) and explicit_tidb_rowid (the
    // dump carries _tidb_rowid): identical observable state — run.sh loops
    // the same probes over both. 'five' is the 5th value either way.
    for (t <- Seq("non_pk", "explicit_tidb_rowid")) {
      val df = tbl(out, "rowid", t)
      val r = df.agg(count(lit(1)), min(col("_row_id")),
        max(col("_row_id"))).collect()(0)
      assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((10L, 1L, 10L)), t)
      assert(df.filter(col("pk") === "five").select("_row_id")
        .collect().map(_.getLong(0)).toSeq === Seq(5L), t)
      assert(nextAutoIncrement(df, "_row_id", ddl(t)) > 10L, t)
    }
    // pre_rebase: 1 row with rowid 1, but CREATE TABLE ... AUTO_INCREMENT=
    // 70000 pins the rebase — the next allocation must clear 70000
    val pre = tbl(out, "rowid", "pre_rebase")
    val r2 = pre.agg(count(lit(1)), min(col("_row_id")),
      max(col("_row_id"))).collect()(0)
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2)) === ((1L, 1L, 1L)))
    assert(nextAutoIncrement(pre, "_row_id", ddl("pre_rebase")) >= 70000L)
    // specific_auto_inc: explicit rowids 79995..79999 preserved verbatim;
    // both the rowid and the auto-inc `b` column rebase past 80000
    val sai = tbl(out, "rowid", "specific_auto_inc")
    assert(sai.count() === 5L)
    assert(sai.select("_row_id").collect().map(_.getLong(0)).sorted.toSeq ===
      (79995L to 79999L))
    assert(sai.agg(sum(col("b"))).collect()(0).getLong(0) === 165L)
    assert(nextAutoIncrement(sai, "_row_id", ddl("specific_auto_inc")) >= 80000L)
    assert(nextAutoIncrement(sai, "b", ddl("specific_auto_inc")) >= 80000L)
  }

  test("tidb_duplicate_data: on-duplicate replace/ignore/error over a half-imported target") {
    assume(refTests.isDirectory)
    import graft.sinks.{JdbcSink, OnDuplicate}
    val fixture = new File(refTests, "tidb_duplicate_data/data")
    for ((mode, wantPk1, wantPk2) <- Seq(
        (OnDuplicate.Replace, "new", "new"),   // run.sh replace branch
        (OnDuplicate.Ignore, "old", "new"),    // run.sh ignore branch
        (OnDuplicate.Error, null, null))) {    // run.sh error branch
      // the reference's failpoint kills the first run after SOME rows
      // imported; model that end state directly: pk=1 landed as 'old'
      FakeSqlTarget.reset()
      FakeSqlTarget.seed("dup.dup", 1L, "'old'")
      // run.sh then seds the data to 'new' and re-runs the same config
      val src = java.nio.file.Files.createTempDirectory("graft-dup").toFile
      for (f <- fixture.listFiles()) {
        val content = java.nio.file.Files.readString(f.toPath)
          .replace("'old'", "'new'")
        java.nio.file.Files.writeString(
          new File(src, f.getName).toPath, content)
      }
      val out = java.nio.file.Files
        .createTempDirectory(s"graft-dup-out").toString
      val sink = new JdbcSink("jdbc:fake", new java.util.Properties(), mode,
        maxRetries = 0, connFactory = Some(() => FakeSqlTarget.connection()))
      val cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
        filter = TableFilter(doTables = Seq(("dup", "*"))),
        checkpointEnabled = false)
      if (mode == OnDuplicate.Error) {
        // plain INSERT collides on the leftover pk=1 → Duplicate entry,
        // import fails (run.sh asserts ERRORCODE != 0 + the message)
        val e = intercept[Throwable] {
          new ImportPipeline(spark, cfg, sink = Some(sink)).run()
        }
        def messages(t: Throwable): Seq[String] =
          if (t == null) Nil
          else Option(t.getMessage).toSeq ++ messages(t.getCause)
        assert(messages(e).exists(_.contains("Duplicate entry")),
          s"expected Duplicate entry, got: ${messages(e).mkString(" | ")}")
      } else {
        new ImportPipeline(spark, cfg, sink = Some(sink)).run()
        val rows = FakeSqlTarget.rowsOf("dup.dup")
        assert(rows.size === 2,
          s"rows=$rows stmts=${FakeSqlTarget.statements}")
        assert(rows(1L) === s"'$wantPk1'", s"$mode pk=1")
        assert(rows(2L) === s"'$wantPk2'", s"$mode pk=2")
      }
    }
  }

  test("concurrent-restore: 8 tables under a 4-way pool; two pipelines " +
      "sharing one target converge without corrupting the commit log") {
    // reference tests/concurrent-restore/run.sh + config.toml: 8 one-row
    // tables imported with table-concurrency = 4 (the GC-lifetime probe
    // is TiKV-specific, scoped out per BASELINE.json); run.sh asserts
    // sum(i) = 1 per table. Beyond the faithful port, the second half
    // exercises the semantics the reference leaves implicit: two importer
    // PROCESSES aimed at the same target (disjoint table sets, one shared
    // file commit log) must both land their tables and leave 8 clean
    // `imported` states — the fleet-of-importers deployment the JDBC
    // checkpoint driver exists for, here over the file driver.
    val tableCount = 8
    def mkSource(): File = {
      val src = java.nio.file.Files.createTempDirectory("graft-conc").toFile
      java.nio.file.Files.writeString(
        new File(src, "restore_conc-schema-create.sql").toPath,
        "CREATE DATABASE restore_conc;")
      for (i <- 1 to tableCount) {
        java.nio.file.Files.writeString(
          new File(src, s"restore_conc.tbl$i-schema.sql").toPath,
          s"CREATE TABLE tbl$i(i TINYINT);")
        java.nio.file.Files.writeString(
          new File(src, s"restore_conc.tbl$i.sql").toPath,
          s"INSERT INTO tbl$i VALUES (1);")
      }
      src
    }
    // faithful port: one pipeline, 4-way table pool
    val src = mkSource()
    val out = java.nio.file.Files.createTempDirectory("graft-conc-out").toString
    val reports = new ImportPipeline(spark, ImportConfig(
      sourceDir = src.getAbsolutePath, outDir = out,
      filter = TableFilter(doTables = Seq(("restore_conc", "*"))),
      tableConcurrency = 4)).run()
    assert(reports.size === tableCount && reports.forall(_.error.isEmpty))
    for (i <- 1 to tableCount) {
      val r = tbl(out, "restore_conc", s"tbl$i")
        .agg(sum(col("i"))).collect()(0)
      assert(r.getLong(0) === 1L, s"tbl$i sum")
    }
    // two concurrent pipelines, same target + shared commit log,
    // disjoint halves (per-table state files: no write overlap by key,
    // but discovery/log listing and sink dirs are fully shared)
    val src2 = mkSource()
    val out2 = java.nio.file.Files.createTempDirectory("graft-conc2-out").toString
    def half(lo: Int, hi: Int) = ImportConfig(
      sourceDir = src2.getAbsolutePath, outDir = out2,
      filter = TableFilter(doTables =
        (lo to hi).map(i => ("restore_conc", s"tbl$i"))),
      tableConcurrency = 2,
      smallTableBytes = 0) // per-table commits, the multi-process shape
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val f1 = Future(new ImportPipeline(spark, half(1, 4)).run())
    val f2 = Future(new ImportPipeline(spark, half(5, 8)).run())
    val (r1, r2) = (Await.result(f1, 5.minutes), Await.result(f2, 5.minutes))
    assert(r1.size === 4 && r2.size === 4 &&
      (r1 ++ r2).forall(_.error.isEmpty))
    for (i <- 1 to tableCount) {
      val r = tbl(out2, "restore_conc", s"tbl$i")
        .agg(sum(col("i")), count(lit(1))).collect()(0)
      assert((r.getLong(0), r.getLong(1)) === ((1L, 1L)), s"tbl$i")
    }
    // the shared commit log holds 8 clean imported states whose counts
    // match the reports — concurrent writers corrupted nothing
    val log = new graft.sinks.CommitLog(out2,
      spark.sparkContext.hadoopConfiguration)
    val states = log.listTables().filter(_.status == "imported")
    assert(states.size === tableCount,
      s"log states: ${log.listTables().map(s => (s.table, s.status))}")
    assert(states.forall(_.rows == 1L))
    // convergence: a rerun of either half over the shared target resumes
    // every table as an already-imported skip
    val again = new ImportPipeline(spark, half(1, 4)).run()
    assert(again.size === 4 && again.forall(_.resumedSkip))
  }
}

/** In-JVM stateful fake SQL target for the gauntlet's JDBC scenarios:
  * applies REPLACE / INSERT IGNORE / INSERT semantics tuple-by-tuple to a
  * per-table pk→values map, raises MySQL's Duplicate entry on a
  * plain-INSERT collision (non-retryable, error 1062), and can poison
  * whole tables (non-retryable write failure — the "this table's target
  * is broken" seam the error_summary scenario needs). */
object FakeSqlTarget {
  import java.lang.reflect.{InvocationHandler, Method, Proxy}
  import java.util.concurrent.ConcurrentHashMap
  val tables = new ConcurrentHashMap[String, ConcurrentHashMap[Long, String]]()
  val statements = new java.util.concurrent.CopyOnWriteArrayList[String]()
  @volatile var failTables: Set[String] = Set.empty

  def reset(poison: Set[String] = Set.empty): Unit = {
    tables.clear(); statements.clear(); failTables = poison
  }

  def rowsOf(dbTable: String): Map[Long, String] = {
    import scala.jdk.CollectionConverters._
    Option(tables.get(dbTable)).map(_.asScala.toMap).getOrElse(Map.empty)
  }

  def seed(dbTable: String, pk: Long, rest: String): Unit =
    tables.computeIfAbsent(dbTable, _ => new ConcurrentHashMap()).put(pk, rest)

  def connection(): java.sql.Connection = Proxy.newProxyInstance(
    getClass.getClassLoader, Array(classOf[java.sql.Connection]),
    new InvocationHandler {
      def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "createStatement" => statement()
          case _ => null
        }
    }).asInstanceOf[java.sql.Connection]

  private def statement(): java.sql.Statement = Proxy.newProxyInstance(
    getClass.getClassLoader, Array(classOf[java.sql.Statement]),
    new InvocationHandler {
      def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
        m.getName match {
          case "execute" =>
            apply(args(0).asInstanceOf[String])
            java.lang.Boolean.TRUE
          case _ => null
        }
    }).asInstanceOf[java.sql.Statement]

  private val Header = """^(REPLACE INTO|INSERT IGNORE INTO|INSERT INTO) `([^`]+)`\.`([^`]+)`""".r

  private def apply(sql: String): Unit = {
    statements.add(sql.take(200))
    if (sql.startsWith("ANALYZE")) return
    val h = Header.findFirstMatchIn(sql)
      .getOrElse(sys.error(s"unexpected statement: ${sql.take(80)}"))
    val dbTable = s"${h.group(2)}.${h.group(3)}"
    if (failTables.contains(dbTable))
      throw new java.sql.SQLSyntaxErrorException(
        s"table $dbTable is unavailable (fake)")
    val rows = tables.computeIfAbsent(dbTable, _ => new ConcurrentHashMap())
    val values = sql.substring(sql.indexOf(" VALUES ") + 8)
    val tuples = values.stripPrefix("(").stripSuffix(")").split("\\),\\(")
      .toSeq.filter(_.nonEmpty).map { t =>
        val cut = t.indexOf(',')
        if (cut < 0) (t.toLong, "")
        else (t.take(cut).toLong, t.drop(cut + 1))
      }
    h.group(1) match {
      case "REPLACE INTO" => tuples.foreach { case (pk, d) => rows.put(pk, d) }
      case "INSERT IGNORE INTO" =>
        tuples.foreach { case (pk, d) => rows.putIfAbsent(pk, d) }
      case "INSERT INTO" => tuples.foreach { case (pk, d) =>
        if (rows.containsKey(pk))
          throw new java.sql.SQLIntegrityConstraintViolationException(
            s"Duplicate entry '$pk' for key 'PRIMARY'", "23000", 1062)
        rows.put(pk, d)
      }
    }
  }
}
