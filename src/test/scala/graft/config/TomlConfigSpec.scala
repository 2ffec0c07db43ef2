package graft.config

import java.nio.file.{Files, Path}
import graft.operators.SqlMode
import org.scalatest.funsuite.AnyFunSuite

/** TOML config adapter against the reference's OWN config fixtures
  * (read-only from /root/reference/tests/<i>/config.toml) — the key names
  * and the unknown-key policy are the reference's UX contract
  * (lightning/config/config.go:287-345). */
class TomlConfigSpec extends AnyFunSuite {

  private def fixture(rel: String): String =
    Files.readString(Path.of("/root/reference/tests", rel))

  test("csv fixture: the [mydumper.csv] matrix lands in CsvConfig verbatim") {
    val t = TomlImportConfig.load(fixture("csv/config.toml"), outDir = "/out")
    val csv = t.config.csv
    assert(csv.separator === ",")
    assert(csv.delimiter === "\"")
    assert(!csv.header)
    assert(!csv.notNull)
    assert(csv.nullRepr === "\\N")
    assert(csv.backslashEscape)
    assert(!csv.trimLastSep)
    assert(t.warnings.isEmpty)
  }

  test("routes fixture: [[routes]] becomes RouteRule with wildcards intact") {
    val t = TomlImportConfig.load(fixture("routes/config.toml"))
    assert(t.config.routes.size === 1)
    val r = t.config.routes.head
    assert(r.schemaPattern === "routes_a*")
    assert(r.tablePattern === "t*")
    assert(r.targetSchema === "routes_b")
    assert(r.targetTable === "u")
    assert(r.matches("routes_a1", "t2"))
    assert(!r.matches("routes_b", "u"))
  }

  test("checkpoint fixture: mysql driver, keep-after-success, 1-byte chunks") {
    val t = TomlImportConfig.load(fixture("checkpoint/config.toml"))
    assert(t.config.checkpointEnabled)
    assert(t.config.checkpointUrl.exists(_.startsWith("jdbc:mysql://")))
    assert(t.keepCheckpointAfterSuccess)
    assert(t.config.tableConcurrency === 1)
    assert(t.config.minChunkBytes === 1L)
  }

  test("sqlmode fixtures: off.toml's ALLOW_INVALID_DATES is lenient; " +
      "on.toml (empty = reference defaults) is strict") {
    val off = TomlImportConfig.load(fixture("sqlmode/off.toml"))
    assert(off.config.sqlMode === SqlMode.Lenient)
    val on = TomlImportConfig.load(fixture("sqlmode/on.toml"))
    assert(on.config.sqlMode === SqlMode.Strict)
  }

  test("unused_config_keys fixture: rejected with the reference's message") {
    val e = intercept[IllegalArgumentException] {
      TomlImportConfig.load(fixture("unused_config_keys/config.toml"))
    }
    assert(e.getMessage.startsWith(
      "config file contained unknown configuration options:"))
    assert(e.getMessage.contains("typo-1"))
    assert(e.getMessage.contains("lightning.typo-2"))
    assert(e.getMessage.contains("typo-3"))
  }

  test("cmdline_override fixture: global-only keys warn instead of reject") {
    val t = TomlImportConfig.load(fixture("cmdline_override/config.toml"))
    assert(t.config.sourceDir === "xyzxyzxyz")
    assert(t.tidb.exists(db => db.host == "xyzxyzxyz" && db.port == 12345678))
    // lightning.file and lightning.level are GlobalConfig-only
    assert(t.warnings.exists(_.contains("lightning.file")))
    assert(t.warnings.exists(_.contains("lightning.level")))
  }

  test("black-white-list: do-dbs / do-tables / ignore-tables feed TableFilter") {
    val t = TomlImportConfig.load(
      """[black-white-list]
        |do-dbs = ["good"]
        |ignore-dbs = ["never-consulted"]
        |
        |[[black-white-list.do-tables]]
        |db-name = "good"
        |table-name = "t1"
        |
        |[[black-white-list.ignore-tables]]
        |db-name = "good"
        |table-name = "t2"
        |""".stripMargin)
    val f = t.config.filter
    assert(f.keep("good", "t1"))
    assert(!f.keep("good", "t2"))  // ignore-tables
    assert(!f.keep("other", "t1")) // not in do-dbs
    assert(!f.keep("mysql", "t1")) // system schema
  }

  test("tikv-importer backend/on-duplicate and post-restore toggles map") {
    val t = TomlImportConfig.load(
      """[tikv-importer]
        |backend = "tidb"
        |on-duplicate = "ignore"
        |
        |[post-restore]
        |checksum = false
        |analyze = false
        |compact = true
        |""".stripMargin)
    assert(t.backend === "tidb")
    assert(t.onDuplicate === "ignore")
    assert(!t.postChecksum)
    assert(!t.config.postAnalyze)
    assert(t.config.compactTargetBytes.nonEmpty)
  }

  test("toml parser handles quoted keys, escapes, arrays, and comments") {
    val doc = Toml.parse(
      """# top comment
        |plain = "a \"quoted\" value" # trailing comment
        |lit = 'no \ escapes # here'
        |num = 1_000
        |neg = -3.5
        |arr = [1, 2, 3]
        |strs = ["a", 'b,c']
        |[a.b]
        |"dotted.key" = true
        |""".stripMargin)
    assert(doc("plain") === "a \"quoted\" value")
    assert(doc("lit") === "no \\ escapes # here")
    assert(doc("num") === 1000L)
    assert(doc("neg") === -3.5)
    assert(doc("arr") === List(1L, 2L, 3L))
    assert(doc("strs") === List("a", "b,c"))
    val ab = doc("a").asInstanceOf[Map[String, Any]]("b")
      .asInstanceOf[Map[String, Any]]
    assert(ab("dotted.key") === true)
  }

  test("tidb_duplicate_data tomls: backend tidb with the three on-duplicate modes") {
    val t1 = TomlImportConfig.load(fixture("tidb_duplicate_data/replace.toml"))
    assert(t1.backend === "tidb" && t1.onDuplicate === "replace") // default
    val t2 = TomlImportConfig.load(fixture("tidb_duplicate_data/ignore.toml"))
    assert(t2.backend === "tidb" && t2.onDuplicate === "ignore")
    val t3 = TomlImportConfig.load(fixture("tidb_duplicate_data/error.toml"))
    assert(t3.backend === "tidb" && t3.onDuplicate === "error")
  }

  test("sinkFor: tidb backend builds a JdbcSink with the declared verb; importer stays parquet") {
    import graft.sinks.{JdbcSink, OnDuplicate}
    val t = TomlImportConfig.load(
      """[mydumper]
        |data-source-dir = "/src"
        |[tikv-importer]
        |backend = "tidb"
        |on-duplicate = "ignore"
        |[tidb]
        |host = "10.0.0.9"
        |port = 4000
        |user = "root"
        |""".stripMargin, outDir = "/out")
    val sink = TomlImportConfig.sinkFor(t)
    assert(sink.exists(_.isInstanceOf[JdbcSink]))
    // the verb is private state; idempotentReplay distinguishes error mode
    assert(sink.exists(_.asInstanceOf[JdbcSink].idempotentReplay))
    // importer/local backends: the parquet sink is the analog -> None
    assert(TomlImportConfig.sinkFor(t.copy(backend = "importer")).isEmpty)
    assert(TomlImportConfig.sinkFor(t.copy(backend = "local")).isEmpty)
    // named rejects: missing [tidb] target, unknown backend, bad verb
    intercept[IllegalArgumentException] {
      TomlImportConfig.sinkFor(t.copy(tidb = None))
    }
    intercept[IllegalArgumentException] {
      TomlImportConfig.sinkFor(t.copy(backend = "tikv"))
    }
    intercept[IllegalArgumentException] {
      TomlImportConfig.sinkFor(t.copy(onDuplicate = "merge"))
    }
  }

  test("empty [[black-white-list.do-tables]] is a legal match-all rule, not unknown") {
    val t = TomlImportConfig.load(
      """[mydumper]
        |data-source-dir = "/src"
        |[[black-white-list.do-tables]]
        |""".stripMargin, outDir = "/out")
    assert(t.config.filter.doTables === Seq(("*", "*")))
  }

  test("escaped backslash before a closing quote does not swallow the comment") {
    val t = Toml.parse("""k = "a\\" # trailing comment""")
    assert(t("k") === "a\\")
  }

  test("every reference config.toml fixture loads or rejects as designed") {
    // the whole fixture corpus: everything must either load cleanly or be
    // the one deliberately-broken fixture (unused_config_keys)
    val dir = new java.io.File("/root/reference/tests")
    val fixtures = dir.listFiles().filter(_.isDirectory)
      .flatMap(d => Option(new java.io.File(d, "config.toml"))
        .filter(_.exists()))
      .sortBy(_.getPath)
    assert(fixtures.length >= 20)
    for (f <- fixtures) {
      val text = Files.readString(f.toPath)
      if (f.getPath.contains("unused_config_keys"))
        intercept[IllegalArgumentException](TomlImportConfig.load(text))
      else {
        val t = TomlImportConfig.load(text)
        assert(t.config.tableConcurrency >= 1, f.getPath)
      }
    }
  }
}
