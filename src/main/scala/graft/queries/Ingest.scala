package graft.queries

import java.io.{File, PrintWriter}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{KvEncode, RowIdAllocator, SchemaAlign, SqlMode}
import graft.pipeline.{ImportConfig, ImportPipeline}
import graft.sinks.JdbcSink
import graft.sources._
import graft.util.Tables

/** Ingest-operator queries: each entry re-creates dump-format inputs from
  * the sf parquet tables (deterministically), pushes them through the real
  * parser → align → row-id stack, and returns a DataFrame the DuckDB oracle
  * can reproduce with plain SQL over the same parquet — a full-fidelity
  * correctness gate for S5/S6/P1-P5 without shipping fixture files.
  */
object Ingest {

  /** Stable scratch dir (under the repo's target/, per driver constraints). */
  private def scratch(name: String): File = {
    val d = new File(new File("target", "qtmp"), name)
    d.mkdirs()
    d
  }

  private val OrdersKeyCap = 2000 // ~500 rows at any sf (keys are dense-ish)

  private def fmtTs(us: Long): String =
    java.time.LocalDateTime.ofEpochSecond(us / 1000000, ((us % 1000000) * 1000).toInt,
      java.time.ZoneOffset.UTC).toString.replace("T", " ")

  /** S5+P1+P3+P4: orders sample → 4-shard INSERT dump → parse → align →
    * row-id. Oracle reproduces with ROW_NUMBER() in key order. */
  def sqldump_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val d = scratch("sqldump_rt")
    val rows = Tables.load(s, dir, "orders")
      .filter(col("o_orderkey") <= OrdersKeyCap)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy("o_orderkey")
      .collect()
    val ddl =
      """CREATE TABLE `orders_rt` (
        |  `o_orderkey` bigint(20) NOT NULL,
        |  `o_custkey` bigint(20) NOT NULL,
        |  `o_orderstatus` varchar(1) DEFAULT NULL,
        |  `o_totalprice` double DEFAULT NULL,
        |  `o_orderdate` datetime DEFAULT NULL,
        |  `o_orderpriority` varchar(15) DEFAULT NULL,
        |  PRIMARY KEY (`o_orderkey`)
        |) ENGINE=InnoDB;""".stripMargin
    write(new File(d, "rt.orders_rt-schema.sql"), ddl)
    val shards = 4
    val per = math.max(1, (rows.length + shards - 1) / shards)
    rows.grouped(per).zipWithIndex.foreach { case (chunk, i) =>
      val sb = new StringBuilder
      sb ++= "/* shard */\nINSERT INTO `orders_rt` (`o_orderkey`,`o_custkey`,`o_orderstatus`,`o_totalprice`,`o_orderdate`,`o_orderpriority`) VALUES\n"
      sb ++= chunk.map { r =>
        "(" + r.getLong(0) + "," + r.getLong(1) + "," +
          JdbcSink.quoteString(r.getString(2)) + "," + r.getDouble(3) + "," +
          JdbcSink.quoteString(r.getString(4)) + "," +
          JdbcSink.quoteString(r.getString(5)) + ")"
      }.mkString(",\n")
      sb ++= ";\n"
      write(new File(d, f"rt.orders_rt.$i%04d.sql"), sb.toString)
    }
    val table = MysqlDdl.parseCreateTable(ddl)
    val files = d.listFiles().filter(_.getName.matches("rt\\.orders_rt\\.\\d+\\.sql"))
      .map(_.getAbsolutePath).toSeq.sorted
    // through the DataSource V2 seam — same frame as SqlDumpSource.read
    val raw = s.read.format("sqldump").load(files: _*)
    val aligned = SchemaAlign.fromArray(raw, col("vals"),
      Some(table.columns.map(_.name)), table, SqlMode.Lenient,
      keep = Seq(col("src_file").as("_src_file"), col("row_idx").as("_row_idx")))
    RowIdAllocator.fromFileIndex(aligned, "_src_file", "_row_idx", "row_id")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("row_id"))
  }

  val sqldump_roundtrip_sql: String =
    s"""SELECT o_orderkey, o_orderstatus, o_totalprice,
       | CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       | ROW_NUMBER() OVER (ORDER BY o_orderkey) AS row_id
       |FROM orders WHERE o_orderkey <= $OrdersKeyCap""".stripMargin

  /** §2.7×§2.8 continuous import: the same 4-shard dump ingested through
    * the STREAMING face of the sqldump DSv2 source — readStream →
    * per-statement align → parquet append under an AvailableNow trigger —
    * then read back with deterministic row-ids. The oracle is identical to
    * the batch roundtrip: streaming and batch ingest must agree row-for-row. */
  def q_stream_ingest(s: SparkSession, dir: String): DataFrame = {
    sqldump_roundtrip(s, dir).count() // materialize shard files + DDL
    val src = scratch("sqldump_rt")
    // scratch space OUTSIDE target/qtmp: mydump_discover and import_e2e
    // plan over qtmp, and leaked stream copies would change their row sets
    val base = new File("target", "qtmp_stream_ingest")
    val streamDir = new File(base, "src")
    deleteRec(streamDir); streamDir.mkdirs()
    src.listFiles().filter(_.getName.matches("rt\\.orders_rt\\.\\d+\\.sql"))
      .foreach { f =>
        java.nio.file.Files.copy(f.toPath,
          new File(streamDir, f.getName).toPath,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
    val out = new File(base, "out"); val ck = new File(base, "ck")
    deleteRec(out); deleteRec(ck)
    val table = MysqlDdl.parseCreateTable(
      java.nio.file.Files.readString(
        new File(src, "rt.orders_rt-schema.sql").toPath))
    val raw = s.readStream.format("sqldump").load(streamDir.getAbsolutePath)
    val aligned = SchemaAlign.fromArrayPerStatement(raw, col("vals"),
      col("stmt_cols"), table, SqlMode.Lenient,
      keep = Seq(col("src_file").as("_src_file"), col("row_idx").as("_row_idx")),
      kindsCol = Some(col("kinds")))
    // uniform narrow drain width (stateless here, but micro-batch
    // planning/commit overhead still scales with partition count)
    graft.streaming.EventStream.withStreamShuffle(s) {
      val q = aligned.writeStream.format("parquet")
        .option("checkpointLocation", ck.getAbsolutePath)
        .option("path", out.getAbsolutePath)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      val finished = q.awaitTermination(120000)
      // a timed-out (still-active) stream would leave partial output and a
      // nondeterministic gate mismatch — fail loudly instead
      require(finished && !q.isActive,
        "streaming ingest did not terminate within 120s")
    }
    val back = s.read.parquet(out.getAbsolutePath)
    RowIdAllocator.fromFileIndex(back, "_src_file", "_row_idx", "row_id")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("row_id"))
  }

  val q_stream_ingest_sql: String = sqldump_roundtrip_sql

  private val CustKeyCap = 500

  /** S6+S7+P5: customer sample → quirky CSV (quoted strings, backslash
    * escapes, \\N nulls) → CsvSource → align. */
  def csv_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val d = scratch("csv_rt")
    val rows = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") <= CustKeyCap)
      .orderBy("c_custkey")
      .collect()
    val sb = new StringBuilder
    rows.foreach { r =>
      def q(x: String) = "\"" + x.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      sb ++= Seq(
        r.getLong(0).toString, q(r.getString(1)), r.getInt(2).toString,
        r.getDouble(3).toString, q(r.getString(4))).mkString(",")
      sb += '\n'
    }
    write(new File(d, "rt.customer_rt.csv"), sb.toString)
    val ddl =
      """CREATE TABLE `customer_rt` (
        |  `c_custkey` bigint(20) NOT NULL,
        |  `c_name` varchar(32) DEFAULT NULL,
        |  `c_nationkey` int(11) DEFAULT NULL,
        |  `c_acctbal` double DEFAULT NULL,
        |  `c_mktsegment` varchar(16) DEFAULT NULL,
        |  PRIMARY KEY (`c_custkey`)
        |)""".stripMargin
    val table = MysqlDdl.parseCreateTable(ddl)
    // through the DataSource V2 seam — same contract as
    // CsvSource.readIndexed (positional c0…cN + src_file/row_off handles)
    val raw = s.read.format("graftcsv").option("ncols", 5)
      .load(new File(d, "rt.customer_rt.csv").getAbsolutePath)
    SchemaAlign.fromColumns(raw, table.columns.map(_.name), table, SqlMode.Lenient)
  }

  val csv_roundtrip_sql: String =
    s"""SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
       |FROM customer WHERE c_custkey <= $CustKeyCap""".stripMargin

  /** S5 hex/bit literals: BINARY/VARBINARY columns fed 0x…/x'…' hex
    * literals and an INT column fed b'…' bit / 0x… hex literals decode to
    * bytes / numeric values (reference ParseHexStr/ParseBitStr,
    * parser.go:474-486; fixture tests/various_types/data/vt.binary). */
  def binary_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val d = scratch("binary_rt")
    val rows = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") <= CustKeyCap)
      .select(col("c_custkey"), md5(col("c_name")).as("h"), col("c_nationkey"))
      .orderBy("c_custkey")
      .collect()
    val sb = new StringBuilder
    sb ++= "INSERT INTO `bin_rt` VALUES\n"
    sb ++= rows.map { r =>
      val key = r.getLong(0); val h = r.getString(1); val nk = r.getInt(2)
      s"($key,0x$h,x'${h.substring(0, 16)}',b'${java.lang.Integer.toBinaryString(nk)}'," +
        s"0x${java.lang.Long.toHexString(nk.toLong)})"
    }.mkString(",\n")
    sb ++= ";\n"
    write(new File(d, "rt.bin_rt.0001.sql"), sb.toString)
    val ddl =
      """CREATE TABLE `bin_rt` (
        |  `id` bigint(20) NOT NULL,
        |  `bin16` binary(16) DEFAULT NULL,
        |  `vbin` varbinary(8) DEFAULT NULL,
        |  `flags` int(11) DEFAULT NULL,
        |  `n_hex` bigint(20) DEFAULT NULL,
        |  PRIMARY KEY (`id`)
        |)""".stripMargin
    val table = MysqlDdl.parseCreateTable(ddl)
    val raw = SqlDumpSource.read(s,
      Seq(new File(d, "rt.bin_rt.0001.sql").getAbsolutePath))
    // the gate emits hex()-encoded STRINGS for the two BLOB columns: the
    // harness sorts/hashes via pandas, which cannot factorize bytearray
    // values — the internal columns stay BinaryType (the decode path is
    // what's under test); only the gate projection re-encodes
    SchemaAlign.fromArray(raw, col("vals"), None, table, SqlMode.Lenient,
      kindsCol = Some(col("kinds")))
      .select(col("id"), hex(col("bin16")).as("bin16_hex"),
        hex(col("vbin")).as("vbin_hex"), col("flags"), col("n_hex"))
  }

  val binary_roundtrip_sql: String =
    s"""SELECT c_custkey AS id,
       | upper(md5(c_name)) AS bin16_hex,
       | upper(substr(md5(c_name), 1, 16)) AS vbin_hex,
       | c_nationkey AS flags,
       | CAST(c_nationkey AS BIGINT) AS n_hex
       |FROM customer WHERE c_custkey <= $CustKeyCap""".stripMargin

  /** S7 charset: a GB18030-encoded dump file (Chinese text around each
    * customer name) parsed with charset=auto — the per-file probe must
    * detect non-UTF-8 bytes and fall back to GB18030 (reference
    * reader.go:35-65; fixture tests/character_sets/). Oracle rebuilds the
    * same UTF-8 strings with string concat. */
  def charset_roundtrip(s: SparkSession, dir: String): DataFrame = {
    val d = scratch("charset_rt")
    val rows = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") <= CustKeyCap)
      .select(col("c_custkey"), col("c_name"))
      .orderBy("c_custkey")
      .collect()
    val sb = new StringBuilder
    sb ++= "INSERT INTO `cn_rt` VALUES\n"
    sb ++= rows.map { r =>
      s"(${r.getLong(0)},'客户：${r.getString(1)}。')"
    }.mkString(",\n")
    sb ++= ";\n"
    val f = new File(d, "rt.cn_rt.0001.sql")
    val out = new java.io.OutputStreamWriter(
      new java.io.FileOutputStream(f), "GB18030")
    try out.write(sb.toString) finally out.close()
    val ddl =
      """CREATE TABLE `cn_rt` (
        |  `id` bigint(20) NOT NULL,
        |  `label` varchar(64) DEFAULT NULL,
        |  PRIMARY KEY (`id`)
        |)""".stripMargin
    val table = MysqlDdl.parseCreateTable(ddl)
    val raw = SqlDumpSource.read(s, Seq(f.getAbsolutePath), charset = "auto")
    SchemaAlign.fromArray(raw, col("vals"), None, table, SqlMode.Lenient,
      kindsCol = Some(col("kinds")))
      .select("id", "label")
  }

  val charset_roundtrip_sql: String =
    s"""SELECT c_custkey AS id,
       | '客户：' || c_name || '。' AS label
       |FROM customer WHERE c_custkey <= $CustKeyCap""".stripMargin

  /** P1+P2: file misses a column and permutes the rest — defaults fill,
    * projection realigns. */
  def schema_align_defaults(s: SparkSession, dir: String): DataFrame = {
    val d = scratch("align_rt")
    val rows = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") <= CustKeyCap)
      .orderBy("c_custkey")
      .collect()
    // file carries (c_name, c_custkey) only, in that (permuted) order
    val sb = new StringBuilder
    rows.foreach { r =>
      sb ++= "\"" + r.getString(1).replace("\\", "\\\\").replace("\"", "\\\"") + "\""
      sb ++= "," + r.getLong(0) + "\n"
    }
    write(new File(d, "rt.cust_slim.csv"), sb.toString)
    val ddl =
      """CREATE TABLE `cust_slim` (
        |  `c_custkey` bigint(20) NOT NULL,
        |  `c_name` varchar(32) NOT NULL DEFAULT 'anon',
        |  `c_acctbal` double NOT NULL DEFAULT '0',
        |  `c_grade` varchar(8) NOT NULL DEFAULT 'basic'
        |)""".stripMargin
    val table = MysqlDdl.parseCreateTable(ddl)
    val raw = CsvSource.read(s,
      Seq(new File(d, "rt.cust_slim.csv").getAbsolutePath), CsvConfig(), ncols = 2)
    SchemaAlign.fromColumns(raw, Seq("c_name", "c_custkey"), table, SqlMode.Lenient)
  }

  val schema_align_defaults_sql: String =
    s"""SELECT c_custkey, c_name, CAST(0 AS DOUBLE) AS c_acctbal,
       | 'basic' AS c_grade
       |FROM customer WHERE c_custkey <= $CustKeyCap""".stripMargin

  /** S1-S3: discovery + filter + routing over a generated dump dir
    * (rows-only check — file classification is not SQL-expressible).
    * Discovery runs over a DEDICATED root holding exactly the two
    * roundtrips' files: target/qtmp accumulates scratch from whichever
    * gate queries ran earlier, which would make this row set depend on
    * execution order. */
  def mydump_discover(s: SparkSession, dir: String): DataFrame = {
    sqldump_roundtrip(s, dir).count() // ensure shard files exist
    csv_roundtrip(s, dir).count()
    import s.implicits._
    val root = new File("target", "qtmp_discover")
    deleteRec(root); root.mkdirs()
    for (src <- Seq(scratch("sqldump_rt"), scratch("csv_rt"));
         f <- src.listFiles() if f.isFile)
      java.nio.file.Files.copy(f.toPath, new File(root, f.getName).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    val plan = MydumpDiscovery.plan(root.getAbsolutePath,
      routes = Seq(RouteRule("rt", "orders_rt", "rt", "orders_routed")))
    plan.tables.flatMap(t => t.dataFiles.map(f =>
      (t.db, t.table, f.kind.toString, f.part.getOrElse(-1), t.dataFiles.size)))
      .toDF("db", "table_name", "kind", "part", "n_files")
  }

  /** The discovery output over the fixed two-roundtrip fixture is fully
    * deterministic (classification grammar + the routing rule), so the
    * oracle pins it as a literal table — a silent change in the walker,
    * classifier, or router breaks the hash. */
  val mydump_discover_sql: String =
    """SELECT * FROM (VALUES
      |  ('rt', 'customer_rt', 'CsvData', CAST(-1 AS INT), CAST(1 AS INT)),
      |  ('rt', 'orders_routed', 'SqlData', CAST(0 AS INT), CAST(4 AS INT)),
      |  ('rt', 'orders_routed', 'SqlData', CAST(1 AS INT), CAST(4 AS INT)),
      |  ('rt', 'orders_routed', 'SqlData', CAST(2 AS INT), CAST(4 AS INT)),
      |  ('rt', 'orders_routed', 'SqlData', CAST(3 AS INT), CAST(4 AS INT))
      |) t(db, table_name, kind, part, n_files)""".stripMargin

  /** Full pipeline e2e over the generated dump dir — hash-matched:
    * discover → parse → align → row-id → parquet sink + commit log +
    * checksum, then the A3 verification runs IN-QUERY: the sink-side
    * re-scan (independent columnar pass over the written parquet) must
    * reproduce the pipeline's observe-time checksum triple exactly, and
    * the P8 rebase value must clear every written row id. The oracle pins
    * the row count (what DuckDB can see) — the crc evidence is the
    * in-query requires, per the kv_checksum pattern. */
  def import_e2e(s: SparkSession, dir: String): DataFrame = {
    sqldump_roundtrip(s, dir).count() // materialize inputs
    val root = new File("target", "qtmp").getAbsolutePath
    val out = new File("target", "qtmp_out").getAbsolutePath
    deleteRec(new File(out))
    val cfg = ImportConfig(sourceDir = root, outDir = out,
      filter = TableFilter(doTables = Seq(("rt", "orders_rt"))))
    val reports = new ImportPipeline(s, cfg).run()
    val ddl = java.nio.file.Files.readString(
      new File(scratch("sqldump_rt"), "rt.orders_rt-schema.sql").toPath)
    val table = MysqlDdl.parseCreateTable(ddl)
    import s.implicits._
    reports.map { r =>
      val written = s.read.parquet(s"$out/${r.db}/${r.table}")
      // A3: ADMIN CHECKSUM TABLE analog — sink-side re-scan vs pipeline
      val cs = KvEncode.checksumReport(written, table,
          ImportPipeline.tableId(r.db, r.table), "_row_id")
        .filter(col("kv_class") === "data").collect()(0)
      require(cs.getLong(1) == r.dataChecksum && cs.getLong(2) == r.dataBytes &&
        cs.getLong(3) == r.dataKvs,
        s"A3 mismatch for ${r.db}.${r.table}: sink re-scan != pipeline triple")
      // P8: the rebase value must exceed every written row id
      val nextId = graft.operators.RowIdAllocator.nextAutoIncrement(
        written, "_row_id")
      val maxId = written.agg(max(col("_row_id"))).collect()(0).getLong(0)
      require(nextId == maxId + 1, s"rebase $nextId != max(_row_id)+1")
      (r.db, r.table, r.rows, 1)
    }.toDF("db", "table_name", "rows", "a3_ok")
  }

  val import_e2e_sql: String =
    s"""SELECT 'rt' AS db, 'orders_rt' AS table_name,
       | CAST(COUNT(*) AS BIGINT) AS rows, CAST(1 AS INT) AS a3_ok
       |FROM orders WHERE o_orderkey <= $OrdersKeyCap""".stripMargin

  /** P3 lenient SQL_MODE: out-of-range / fractional / garbage values land
    * via MySQL non-strict coercions (clamp / round / numeric-prefix). The
    * oracle reproduces the clamping with plain CASE arithmetic. */
  def sqlmode_lenient(s: SparkSession, dir: String): DataFrame = {
    val d = scratch("sqlmode_rt")
    val rows = Tables.load(s, dir, "part")
      .filter(col("p_partkey") <= CustKeyCap)
      .select("p_partkey", "p_size", "p_retailprice")
      .orderBy("p_partkey")
      .collect()
    // p_size scaled into overflow range; price with trailing junk text
    val sb = new StringBuilder
    rows.foreach { r =>
      sb ++= s"${r.getLong(0)},${r.getInt(1) * 7},${r.getDouble(2)}junk\n"
    }
    write(new File(d, "rt.part_rt.csv"), sb.toString)
    val ddl =
      """CREATE TABLE `part_rt` (
        |  `p_partkey` bigint(20) NOT NULL,
        |  `p_size7` tinyint(4) DEFAULT NULL,
        |  `p_price` double DEFAULT NULL,
        |  PRIMARY KEY (`p_partkey`)
        |)""".stripMargin
    val table = MysqlDdl.parseCreateTable(ddl)
    val raw = CsvSource.read(s,
      Seq(new File(d, "rt.part_rt.csv").getAbsolutePath), CsvConfig(), ncols = 3)
    SchemaAlign.fromColumns(raw, table.columns.map(_.name), table, SqlMode.Lenient)
      .select(col("p_partkey"), col("p_size7").cast("int").as("p_size7"),
        col("p_price"))
  }

  val sqlmode_lenient_sql: String =
    s"""SELECT p_partkey,
       | CAST(least(greatest(p_size * 7, -128), 127) AS INT) AS p_size7,
       | p_retailprice AS p_price
       |FROM part WHERE p_partkey <= $CustKeyCap""".stripMargin

  /** P3 strict SQL_MODE: the same dirty file the lenient query coerces
    * must make a strict import RAISE (ANSI CAST_INVALID_INPUT — the
    * reference aborts under sqlmode=on, tests/sqlmode/); the returned
    * result is the strict import of the clean subset, which the oracle
    * reproduces by filtering. The query FAILS if strict mode silently
    * accepts the dirty rows. */
  def sqlmode_strict(s: SparkSession, dir: String): DataFrame = {
    val d = scratch("sqlmode_strict_rt")
    val rows = Tables.load(s, dir, "part")
      .filter(col("p_partkey") <= CustKeyCap)
      .select("p_partkey", "p_size", "p_retailprice")
      .orderBy("p_partkey")
      .collect()
    val sb = new StringBuilder
    rows.foreach { r =>
      val junk = if (r.getLong(0) % 5 == 0) "junk" else ""
      sb ++= s"${r.getLong(0)},${r.getInt(1)},${r.getDouble(2)}$junk\n"
    }
    write(new File(d, "rt.part_strict.csv"), sb.toString)
    val ddl =
      """CREATE TABLE `part_strict` (
        |  `p_partkey` bigint(20) NOT NULL,
        |  `p_size` int(11) DEFAULT NULL,
        |  `p_price` double DEFAULT NULL,
        |  PRIMARY KEY (`p_partkey`)
        |)""".stripMargin
    val table = MysqlDdl.parseCreateTable(ddl)
    val raw = CsvSource.readIndexed(s,
      Seq(new File(d, "rt.part_strict.csv").getAbsolutePath), CsvConfig(), ncols = 3)
    val strictAll = SchemaAlign.fromColumns(raw, table.columns.map(_.name),
      table, SqlMode.Strict)
    val rejected =
      // collect, not count: count() would prune the cast projection away
      // and the strict casts would never evaluate
      try { strictAll.collect(); false }
      catch { case e: Throwable =>
        def chain(t: Throwable): List[Throwable] =
          if (t == null) Nil else t :: chain(t.getCause)
        chain(e).exists(t => Option(t.getMessage)
          .exists(_.contains("CAST_INVALID_INPUT")))
      }
    require(rejected, "strict mode accepted malformed numeric input")
    val clean = raw.filter(pmod(col("c0").cast("long"), lit(5)) =!= 0)
    SchemaAlign.fromColumns(clean, table.columns.map(_.name), table, SqlMode.Strict)
  }

  val sqlmode_strict_sql: String =
    s"""SELECT p_partkey, p_size, p_retailprice AS p_price
       |FROM part WHERE p_partkey <= $CustKeyCap AND p_partkey % 5 != 0""".stripMargin

  /** P3 ENUM/SET domain checks: invalid ENUM members coerce to '' and
    * invalid SET members are dropped under lenient mode (MySQL non-strict;
    * reference tests/sqlmode fixtures); the oracle reproduces both
    * coercions with CASE/string logic. */
  def sqlmode_enumset(s: SparkSession, dir: String): DataFrame = {
    val d = scratch("enumset_rt")
    val rows = Tables.load(s, dir, "customer")
      .filter(col("c_custkey") <= CustKeyCap)
      .select("c_custkey", "c_mktsegment")
      .orderBy("c_custkey")
      .collect()
    val sb = new StringBuilder
    rows.foreach { r =>
      val key = r.getLong(0)
      val seg = if (key % 7 == 0) r.getString(1) + "X" else r.getString(1)
      val members = Seq(
        if (key % 2 == 0) Some("red") else None,
        if (key % 3 == 0) Some("green") else None,
        if (key % 5 == 0) Some("bad") else None).flatten.mkString(",")
      // quote the SET field: it embeds commas, and an unquoted empty
      // trailing field would parse as NULL instead of ''
      sb ++= s"""$key,$seg,"$members"""" + "\n"
    }
    write(new File(d, "rt.cust_enum.csv"), sb.toString)
    val ddl =
      """CREATE TABLE `cust_enum` (
        |  `c_custkey` bigint(20) NOT NULL,
        |  `seg` enum('BUILDING','AUTOMOBILE','MACHINERY','HOUSEHOLD','FURNITURE') DEFAULT NULL,
        |  `tags` set('red','green','blue') DEFAULT NULL,
        |  PRIMARY KEY (`c_custkey`)
        |)""".stripMargin
    val table = MysqlDdl.parseCreateTable(ddl)
    val raw = CsvSource.readIndexed(s,
      Seq(new File(d, "rt.cust_enum.csv").getAbsolutePath), CsvConfig(), ncols = 3)
    SchemaAlign.fromColumns(raw, table.columns.map(_.name), table, SqlMode.Lenient)
  }

  val sqlmode_enumset_sql: String =
    s"""SELECT c_custkey,
       | CASE WHEN c_custkey % 7 = 0 THEN '' ELSE c_mktsegment END AS seg,
       | concat_ws(',',
       |   CASE WHEN c_custkey % 2 = 0 THEN 'red' END,
       |   CASE WHEN c_custkey % 3 = 0 THEN 'green' END) AS tags
       |FROM customer WHERE c_custkey <= $CustKeyCap""".stripMargin

  /** P6/K3 — hash-matched: bounded multi-row REPLACE statement building,
    * verified by the P6→S5 SYMMETRY the reference gets from MySQL itself —
    * the emitted literal text must parse back through the dump parser into
    * exactly the source rows (every column compared), every statement must
    * respect the byte cap (single oversized tuples excepted, tidb.go
    * behavior), and the packed row total must equal the input. The oracle
    * pins the row count; the statement text evidence is the in-query
    * requires. */
  def jdbc_stmts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val src = Tables.load(s, dir, "supplier").orderBy("s_suppkey").limit(50)
    val rows = src.collect()
    val schema = src.schema
    val stmts = JdbcSink.buildStatements("REPLACE INTO", "g", "supplier",
      schema, rows.iterator, maxBytes = 512).toList
    require(stmts.map(_._2).sum == rows.length,
      s"packed ${stmts.map(_._2).sum} rows != input ${rows.length}")
    require(stmts.forall { case (sql, n) => sql.length <= 512 || n == 1 },
      "multi-row statement exceeds the byte cap")
    require(stmts.forall(_._1.startsWith("REPLACE INTO `g`.`supplier` (")),
      "unexpected statement header")
    // P6 -> S5 roundtrip: write the statements as a dump shard, parse with
    // the real dump parser, align, and compare every column value
    val d = scratch("jdbc_rt")
    write(new File(d, "g.supplier_rt.0001.sql"),
      stmts.map(_._1).mkString("", ";\n", ";\n"))
    // DDL derived from the live parquet schema so the declared shape always
    // matches what the statements carry
    val ddlCols = schema.fields.map { f =>
      val mysqlType = f.dataType match {
        case org.apache.spark.sql.types.LongType => "bigint(20)"
        case org.apache.spark.sql.types.IntegerType => "int(11)"
        case org.apache.spark.sql.types.DoubleType => "double"
        case _ => "varchar(128)"
      }
      s"`${f.name}` $mysqlType DEFAULT NULL"
    }
    val table = MysqlDdl.parseCreateTable(
      s"CREATE TABLE `supplier_rt` (${ddlCols.mkString(", ")})")
    val raw = SqlDumpSource.read(s,
      Seq(new File(d, "g.supplier_rt.0001.sql").getAbsolutePath))
    val back = SchemaAlign.fromArray(raw, col("vals"),
        Some(schema.fieldNames.toSeq), table, SqlMode.Lenient,
        kindsCol = Some(col("kinds")))
      .select(schema.fieldNames.map(col).toSeq: _*)
      .orderBy("s_suppkey").collect()
    require(back.length == rows.length,
      s"parse-back got ${back.length} rows, wrote ${rows.length}")
    rows.zip(back).foreach { case (a, b) =>
      schema.fieldNames.indices.foreach { i =>
        require(a.get(i) == b.get(i),
          s"roundtrip mismatch at ${schema.fieldNames(i)}: ${a.get(i)} != ${b.get(i)}")
      }
    }
    Seq((rows.length.toLong, 1, 1))
      .toDF("total_rows", "bounded_ok", "roundtrip_ok")
  }

  val jdbc_stmts_sql: String =
    """SELECT CAST(LEAST(COUNT(*), 50) AS BIGINT) AS total_rows,
      | CAST(1 AS INT) AS bounded_ok, CAST(1 AS INT) AS roundtrip_ok
      |FROM supplier""".stripMargin

  /** A1+A2: KV checksum over lineitem with a natural row handle — now a
    * hash-matched gate (the dedup_simhash_verify pattern: DuckDB has no
    * crc64-ECMA, so the crc evidence is Spark-internal `require`s and the
    * gate rows carry what the oracle CAN reproduce — per-class KV counts):
    * (1) golden vector — crc64-ECMA("123456789") must equal the published
    * 0x995DC9BBDF1939FA check value; (2) reimplementation equality — the
    * codegen'd Crc64Expr/bit_xor report must equal the independent
    * KvChecksumAgg typed Aggregator (different crc accumulation path,
    * different merge machinery) on both KV classes; (3) distributivity —
    * the XOR/sum fold of two disjoint slices must equal the whole (the
    * property that makes the checksum shardable at 100 TB). */
  def kv_checksum(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.{Crc64, KvChecksum}
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_orderkey") <= OrdersKeyCap)
      .withColumn("_row_id",
        col("l_orderkey") * 10 + col("l_linenumber"))
    val ddl =
      """CREATE TABLE `lineitem_cs` (
        |  `l_orderkey` bigint(20) NOT NULL,
        |  `l_partkey` bigint(20) NOT NULL,
        |  `l_suppkey` bigint(20) NOT NULL,
        |  `l_linenumber` int(11) NOT NULL,
        |  `l_quantity` double NOT NULL,
        |  PRIMARY KEY (`l_orderkey`,`l_linenumber`)
        |)""".stripMargin
    val table = MysqlDdl.parseCreateTable(ddl)
    val cols = table.columns.map(_.name)
    val kvIn = li.select((cols.map(col) :+ col("_row_id")): _*).persist()
    def reportOf(df: DataFrame): Map[String, (Long, Long, Long)] =
      KvEncode.checksumReport(df, table, tableId = 7, rowIdCol = "_row_id")
        .collect().map(r => r.getString(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val whole = reportOf(kvIn)
    // (1) golden check value (ECMA-182 polynomial, standard test vector)
    require(Crc64.checksum("123456789".getBytes("UTF-8")) == 0x995DC9BBDF1939FAL,
      "crc64-ECMA golden vector mismatch")
    // (2) independent-reimplementation equality, both KV classes
    val aggData = KvEncode.dataKv(kvIn, 7, "_row_id", cols)
      .agg(KvChecksum(col("_kv_key"), col("_kv_val")).as("c"))
      .select("c.*").collect()(0)
    require((aggData.getLong(0), aggData.getLong(1), aggData.getLong(2)) ==
      whole("data"), "Aggregator vs codegen report mismatch on data KVs")
    val aggIdx = KvEncode.indexKv(kvIn, 7, 0, table.primaryKey, "_row_id")
      .agg(KvChecksum(col("_kv_key"), col("_kv_val")).as("c"))
      .select("c.*").collect()(0)
    require((aggIdx.getLong(0), aggIdx.getLong(1), aggIdx.getLong(2)) ==
      whole("index"), "Aggregator vs codegen report mismatch on index KVs")
    // (3) distributivity: disjoint halves fold to the whole
    val even = reportOf(kvIn.filter(pmod(col("l_orderkey"), lit(2)) === 0))
    val odd = reportOf(kvIn.filter(pmod(col("l_orderkey"), lit(2)) === 1))
    for (k <- Seq("data", "index")) {
      val (ex, eb, en) = even.getOrElse(k, (0L, 0L, 0L))
      val (ox, ob, on) = odd.getOrElse(k, (0L, 0L, 0L))
      require((ex ^ ox, eb + ob, en + on) == whole(k),
        s"XOR/sum fold of disjoint slices != whole for $k KVs")
    }
    kvIn.unpersist()
    import s.implicits._
    Seq(("data", whole("data")._3, 1, 1, 1),
        ("index", whole("index")._3, 1, 1, 1))
      .toDF("kv_class", "total_kvs", "golden_ok", "reimpl_ok", "distributive_ok")
  }

  val kv_checksum_sql: String =
    s"""SELECT 'data' AS kv_class, CAST(COUNT(*) AS BIGINT) AS total_kvs,
       | CAST(1 AS INT) AS golden_ok, CAST(1 AS INT) AS reimpl_ok,
       | CAST(1 AS INT) AS distributive_ok
       |FROM lineitem WHERE l_orderkey <= $OrdersKeyCap
       |UNION ALL
       |SELECT 'index', CAST(COUNT(*) AS BIGINT), CAST(1 AS INT),
       | CAST(1 AS INT), CAST(1 AS INT)
       |FROM lineitem WHERE l_orderkey <= $OrdersKeyCap""".stripMargin

  private def write(f: File, content: String): Unit = {
    val pw = new PrintWriter(f, "UTF-8")
    try pw.write(content) finally pw.close()
  }

  private def deleteRec(f: File): Unit = graft.util.Dirs.deleteRec(f)
}
