package graft.pipeline

import java.io.File
import graft.SparkSpec
import graft.operators.SqlMode
import graft.sinks.{JdbcSink, OnDuplicate}

/** In-JVM fake DB for the JDBC chunk-resume test: records every executed
  * statement (local-mode executors share the JVM). `failOnIds` poisons
  * execution when a statement mentions one of the ids — the "server dies
  * mid-import" crash. */
object FakeDb {
  import java.lang.reflect.{InvocationHandler, Method, Proxy}
  val executed = new java.util.concurrent.CopyOnWriteArrayList[String]()
  @volatile var failOnMarker: Option[String] = None

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
            val sql = args(0).asInstanceOf[String]
            failOnMarker.filter(sql.contains).foreach { _ =>
              // non-retryable so the write aborts immediately
              throw new java.sql.SQLSyntaxErrorException("server lost (fake)")
            }
            executed.add(sql)
            java.lang.Boolean.TRUE
          case _ => null
        }
    }).asInstanceOf[java.sql.Statement]
}

class ChunkResumeSpec extends SparkSpec {

  private def freshOut(): String =
    java.nio.file.Files.createTempDirectory("graft-ckr").toString

  private def writeCsv(dir: File, name: String, lo: Int, hi: Int): Unit =
    java.nio.file.Files.writeString(new File(dir, name).toPath,
      (lo to hi).map(i => s"$i,$i.5").mkString("", "\n", "\n"))

  private val table = graft.sources.MysqlDdl.parseCreateTable(
    "CREATE TABLE `t` (`id` int(11) NOT NULL, `v` double, PRIMARY KEY (`id`))")

  private def cfgFor(src: File, out: String, cb: Long = 64) = ImportConfig(
    sourceDir = src.getAbsolutePath, outDir = out,
    schemaCatalog = Map(("cr", "t") -> table),
    chunkCommitBytes = cb) // 64 B → one chunk group per file

  test("resume reconciles orphan output from a crash between append and commit") {
    val src = java.nio.file.Files.createTempDirectory("graft-cr1").toFile
    writeCsv(src, "cr.t.0001.csv", 1, 50)
    writeCsv(src, "cr.t.0002.csv", 51, 100)
    val out = freshOut()
    assert(new ImportPipeline(spark, cfgFor(src, out)).run().head.rows === 100)
    // simulate the ADVICE crash: chunk 2's parquet append committed but its
    // state write did not — delete the state file, keep the output files
    val stateDir = new File(out, "_state")
    val chunk2State = stateDir.listFiles()
      .filter(f => f.getName.contains(".chunk.") && f.getName.endsWith(".json"))
      .find(f => java.nio.file.Files.readString(f.toPath).contains("0002.csv"))
      .getOrElse(fail("no chunk state for file 2"))
    chunk2State.delete()
    // the local FS also keeps a .crc sidecar; stale CRC would fail reads
    new File(stateDir, s".${chunk2State.getName}.crc").delete()
    val report = new ImportPipeline(spark, cfgFor(src, out)).run().head
    assert(report.rows === 100)
    // without reconciliation this would be 150 (chunk 2 appended twice)
    assert(spark.read.parquet(s"$out/cr/t").count() === 100)
    assert(spark.read.parquet(s"$out/cr/t")
      .select("id").distinct().count() === 100)
  }

  test("changing chunkCommitBytes between runs re-imports instead of duplicating") {
    val src = java.nio.file.Files.createTempDirectory("graft-cr2").toFile
    writeCsv(src, "cr.t.0001.csv", 1, 50)
    writeCsv(src, "cr.t.0002.csv", 51, 100)
    val out = freshOut()
    assert(new ImportPipeline(spark, cfgFor(src, out, cb = 64))
      .run().head.rows === 100)
    // new group layout → every chunkId differs; the layout is part of the
    // reuse fingerprint, so the old states are invalid and output is reset.
    // NOTE: checkpointEnabled table-level skip would kick in first on a
    // truly unchanged import; poke the table state away to force the
    // chunk path to run again (the crashed-mid-table scenario).
    new graft.sinks.CommitLog(out, spark.sparkContext.hadoopConfiguration)
      .remove("cr", "t")
    val report = new ImportPipeline(spark, cfgFor(src, out, cb = 1 << 20))
      .run().head
    assert(report.rows === 100)
    assert(spark.read.parquet(s"$out/cr/t").count() === 100)
  }

  test("JDBC sink: killed import resumes from last committed chunk, no replay of done chunks") {
    val src = java.nio.file.Files.createTempDirectory("graft-cr3").toFile
    writeCsv(src, "cr.t.0001.csv", 1, 50)
    writeCsv(src, "cr.t.0002.csv", 51, 100)
    val out = freshOut()
    FakeDb.executed.clear()
    FakeDb.failOnMarker = Some("(100,") // poison the last row of chunk 2
    val sink = new JdbcSink("jdbc:fake", new java.util.Properties(),
      OnDuplicate.Replace, maxRetries = 0,
      connFactory = Some(() => FakeDb.connection()))
    intercept[Throwable] {
      new ImportPipeline(spark, cfgFor(src, out), sink = Some(sink)).run()
    }
    assert(FakeDb.executed.toArray.exists(_.toString.contains("(50,")),
      "chunk 1 statements missing before the crash")
    // server "recovers"; rerun — chunk 1 is committed and must NOT replay
    FakeDb.failOnMarker = None
    val report = new ImportPipeline(spark, cfgFor(src, out),
      sink = Some(sink)).run().head
    assert(report.rows === 100)
    val sqls = FakeDb.executed.toArray.map(_.toString)
    def countRow(id: Int) = sqls.count(_.contains(s"($id,"))
    assert(countRow(1) === 1, "chunk 1 was replayed on resume")
    assert(countRow(100) === 1, "chunk 2 row missing after resume")
  }

  test("continueOnError: failed table is summarized, the rest import; rerun heals") {
    import graft.operators.SqlMode
    val src = java.nio.file.Files.createTempDirectory("graft-coe").toFile
    java.nio.file.Files.writeString(new File(src, "eo.good.csv").toPath,
      (1 to 20).map(i => s"$i,$i.5").mkString("", "\n", "\n"))
    java.nio.file.Files.writeString(new File(src, "eo.bad.csv").toPath,
      "1,1.5\n2,junk\n")
    val t = graft.sources.MysqlDdl.parseCreateTable(
      "CREATE TABLE `x` (`id` int(11) NOT NULL, `v` double)")
    val out = freshOut()
    def cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
      sqlMode = SqlMode.Strict, continueOnError = true,
      schemaCatalog = Map(("eo", "good") -> t, ("eo", "bad") -> t))
    val reports = new ImportPipeline(spark, cfg).run()
    val byTable = reports.map(r => r.table -> r).toMap
    assert(byTable("bad").error.nonEmpty)
    assert(byTable("good").error.isEmpty && byTable("good").rows === 20)
    // the failure did not poison the commit log: repair + rerun imports
    // only the failed table (good resumes by skip)
    java.nio.file.Files.writeString(new File(src, "eo.bad.csv").toPath,
      "1,1.5\n2,2.5\n")
    val again = new ImportPipeline(spark, cfg).run()
    val byTable2 = again.map(r => r.table -> r).toMap
    assert(byTable2("good").resumedSkip)
    assert(byTable2("bad").error.isEmpty && byTable2("bad").rows === 2)
  }

  test("failed checkpoint blocks same-input rerun until error-ignore clears it") {
    import graft.operators.SqlMode
    val src = java.nio.file.Files.createTempDirectory("graft-ei").toFile
    java.nio.file.Files.writeString(new File(src, "ei.t.csv").toPath,
      "1,1.5\n2,junk\n")
    val t = graft.sources.MysqlDdl.parseCreateTable(
      "CREATE TABLE `t` (`id` int(11) NOT NULL, `v` double)")
    val out = freshOut()
    def cfg = ImportConfig(sourceDir = src.getAbsolutePath, outDir = out,
      sqlMode = SqlMode.Strict, continueOnError = true,
      schemaCatalog = Map(("ei", "t") -> t))
    val r1 = new ImportPipeline(spark, cfg).run()
    assert(r1.head.error.nonEmpty)
    // same inputs, failed checkpoint → the rerun must REFUSE with the ctl
    // guidance (reference: lightning exits until error-ignore/-destroy)
    val r2 = new ImportPipeline(spark, cfg).run()
    assert(r2.head.error.exists(_.contains("checkpoint-error-ignore")), r2.head.error)
    // repair the data, error-ignore (status cleared, data kept), resume
    java.nio.file.Files.writeString(new File(src, "ei.t.csv").toPath,
      "1,1.5\n2,junk\n") // same bytes: fingerprint unchanged — ignore is
                         // what unblocks, not a repaired source
    val log = new graft.sinks.CommitLog(out,
      spark.sparkContext.hadoopConfiguration)
    assert(log.errorIgnore("ei", "t"))
    assert(!log.errorIgnore("ei", "t")) // second call: nothing failed now
    // strict junk still fails, so relax to lenient for the healing run —
    // the point is the gate opens after ignore
    val r3 = new ImportPipeline(spark,
      cfg.copy(sqlMode = SqlMode.Lenient)).run()
    assert(r3.head.error.isEmpty && r3.head.rows === 2, r3.head)
  }

  test("non-idempotent JDBC (INSERT) refuses chunk checkpoints") {
    val sink = new JdbcSink("jdbc:fake", new java.util.Properties(),
      OnDuplicate.Error, connFactory = Some(() => FakeDb.connection()))
    assert(!sink.idempotentReplay)
  }

  test("checkpoint_chunks: killed after every chunk, the import converges; " +
      "the final rerun is a pure no-op") {
    // the reference's crash gauntlet (tests/checkpoint_chunks): a run that
    // dies after each chunk must still converge to exactly-once delivery,
    // and a rerun over the finished import must send NOTHING
    val src = java.nio.file.Files.createTempDirectory("graft-cpch").toFile
    val files = 5
    for (i <- 1 to files)
      writeCsv(src, f"cr.t.000$i%d.csv", (i - 1) * 10 + 1, i * 10)
    val out = freshOut()
    FakeDb.executed.clear()
    val sink = new JdbcSink("jdbc:fake", new java.util.Properties(),
      OnDuplicate.Replace, maxRetries = 0,
      connFactory = Some(() => FakeDb.connection()))
    // kill runs 1..4 at the first row of the NEXT uncommitted chunk
    for (k <- 1 until files) {
      FakeDb.failOnMarker = Some(s"(${k * 10 + 1},")
      intercept[Throwable] {
        new ImportPipeline(spark, cfgFor(src, out), sink = Some(sink)).run()
      }
    }
    FakeDb.failOnMarker = None
    val report = new ImportPipeline(spark, cfgFor(src, out),
      sink = Some(sink)).run().head
    assert(report.rows === 50)
    val sqls = FakeDb.executed.toArray.map(_.toString)
    def hits(id: Int) = sqls.count(_.contains(s"($id,"))
    for (id <- 1 to 50)
      assert(hits(id) === 1, s"row $id delivered ${hits(id)} times")
    // checkpoint no-op: the rerun must not touch the target at all
    val before = FakeDb.executed.size()
    val again = new ImportPipeline(spark, cfgFor(src, out),
      sink = Some(sink)).run().head
    assert(again.resumedSkip && again.rows === 50)
    assert(FakeDb.executed.size() === before,
      "no-op rerun sent statements to the target")
  }

  test("file-driver writeIfAbsent: create-exclusive, the loser adopts the winner") {
    val out = freshOut()
    val log = new graft.sinks.CommitLog(out,
      spark.sparkContext.hadoopConfiguration)
    val a = graft.sinks.TableState("d", "t", "loaded", 0, 0, 0, 0, "fp", 111L)
    val b = a.copy(jobTsMicros = 222L)
    assert(log.writeIfAbsent(a).jobTsMicros === 111L)
    assert(log.writeIfAbsent(b).jobTsMicros === 111L)
    assert(log.read("d", "t").map(_.jobTsMicros) === Some(111L))
  }

  test("pinned job ts survives crash/resume with a DIFFERENT resume ts " +
      "(reference checkpoint_timestamp: COUNT(DISTINCT ts) = 1)") {
    val src = java.nio.file.Files.createTempDirectory("graft-cts").toFile
    // two single-statement files → two chunk groups at 64 B granularity;
    // the column list omits `ts`, so the CURRENT_TIMESTAMP default fills
    java.nio.file.Files.writeString(new File(src, "cpts.t.0001.sql").toPath,
      "INSERT INTO `t` (`id`) VALUES (1),(2),(3);\n")
    java.nio.file.Files.writeString(new File(src, "cpts.t.0002.sql").toPath,
      "INSERT INTO `t` (`id`) VALUES (4),(5),(6);\n")
    val tsTable = graft.sources.MysqlDdl.parseCreateTable(
      "CREATE TABLE `t` (`id` int(11) NOT NULL, " +
        "`ts` timestamp NOT NULL DEFAULT CURRENT_TIMESTAMP, " +
        "PRIMARY KEY (`id`))")
    val out = freshOut()
    def cfgTs(ts: Long) = ImportConfig(sourceDir = src.getAbsolutePath,
      outDir = out, schemaCatalog = Map(("cpts", "t") -> tsTable),
      chunkCommitBytes = 64, jobTsMicros = ts)
    FakeDb.executed.clear()
    FakeDb.failOnMarker = Some("(6,") // kill the run inside chunk 2
    val sink = new JdbcSink("jdbc:fake", new java.util.Properties(),
      OnDuplicate.Replace, maxRetries = 0,
      connFactory = Some(() => FakeDb.connection()))
    val t1 = 1234567890000000L
    intercept[Throwable] {
      new ImportPipeline(spark, cfgTs(t1), sink = Some(sink)).run()
    }
    // the operator retries later: the NEW run's config pins a new ts, but
    // the resumed chunks must reuse the ORIGINAL run's ts — otherwise the
    // table ends up with two distinct CURRENT_TIMESTAMP values
    FakeDb.failOnMarker = None
    val report = new ImportPipeline(spark, cfgTs(t1 + 999999000000L),
      sink = Some(sink)).run().head
    assert(report.rows === 6)
    val stamps = FakeDb.executed.toArray.map(_.toString)
      .filter(_.contains("INTO `cpts`.`t`"))
      .flatMap("'([0-9]{4}-[0-9]{2}-[0-9]{2}[^']*)'".r.findAllMatchIn(_)
        .map(_.group(1)))
    assert(stamps.nonEmpty, "no timestamp literals reached the sink")
    assert(stamps.distinct.length === 1,
      s"resume minted a second job timestamp: ${stamps.distinct.toSeq}")
  }
}
