package graft.config

import graft.operators.SqlMode
import graft.pipeline.ImportConfig
import graft.sources.{CsvConfig, RouteRule, TableFilter}

/** The parts of a reference task config that graft's `ImportConfig`
  * doesn't model directly but callers act on (backend selection, target
  * DB coordinates, post-restore toggles). */
final case class TidbTarget(host: String, port: Int, user: String,
    password: String)

final case class LoadedTask(
    config: ImportConfig,
    backend: String,        // tikv-importer.backend: "importer" | "tidb"
    onDuplicate: String,    // tikv-importer.on-duplicate (tidb backend)
    noSchema: Boolean,      // mydumper.no-schema
    postChecksum: Boolean,  // post-restore.checksum (A3 verify pass)
    keepCheckpointAfterSuccess: Boolean,
    tidb: Option[TidbTarget],
    // GlobalConfig-only keys present in a task config — accepted with a
    // warning, exactly like the reference ("currently only per-task
    // configuration can be applied", config.go:337-340)
    warnings: Seq[String])

/** `tidb-lightning.toml` → `ImportConfig` adapter (reference
  * lightning/config/config.go:95-246 key names, loaded with the same
  * unknown-key policy as Config.LoadFromTOML, config.go:287-345):
  *
  *  - keys the reference's task Config decodes are accepted and mapped
  *    (or deliberately no-op'd where Spark replaces the machinery — the
  *    worker-pool concurrency knobs, cron periods, TLS paths);
  *  - keys only the reference's GlobalConfig decodes (log settings,
  *    server-mode, status-addr) are accepted with a warning;
  *  - anything else fails with the reference's own message:
  *    "config file contained unknown configuration options: …"
  *    (pinned by tests/unused_config_keys).
  *
  * The reference has no output directory (it writes into TiDB); callers
  * pass `outDir`, or set the graft extension key `[graft] out-dir`. */
object TomlImportConfig {

  def load(text: String, outDir: String = ""): LoadedTask = {
    val doc = Toml.parse(text)
    val leaves = leafPaths(doc)

    val unknown = leaves.filterNot(p => accepted(p) || globalOnly(p))
    if (unknown.nonEmpty)
      throw new IllegalArgumentException(
        "config file contained unknown configuration options: " +
          unknown.mkString(", "))
    val warnings = leaves.filter(globalOnly).map(k =>
      s"global config key `$k` is ignored in a task config " +
        "(only per-task configuration can be applied)")

    def tbl(path: String*): Map[String, Any] =
      path.foldLeft(doc: Any) {
        case (m: Map[String @unchecked, Any @unchecked], k) =>
          m.getOrElse(k, Map.empty[String, Any])
        case _ => Map.empty[String, Any]
      }.asInstanceOf[Map[String, Any]]
    def str(m: Map[String, Any], k: String, dflt: String): String =
      m.get(k).map(_.toString).getOrElse(dflt)
    def bool(m: Map[String, Any], k: String, dflt: Boolean): Boolean =
      m.get(k) match {
        case Some(b: Boolean) => b
        case Some(other) => throw new IllegalArgumentException(
          s"key `$k` must be a boolean, got $other")
        case None => dflt
      }
    def long(m: Map[String, Any], k: String, dflt: Long): Long =
      m.get(k) match {
        case Some(n: Long) => n
        case Some(other) => throw new IllegalArgumentException(
          s"key `$k` must be an integer, got $other")
        case None => dflt
      }

    val mydumper = tbl("mydumper")
    val csvT = tbl("mydumper", "csv")
    val tidbT = tbl("tidb")
    val cp = tbl("checkpoint")
    val post = tbl("post-restore")
    val importer = tbl("tikv-importer")
    val app = tbl("lightning")
    val bw = tbl("black-white-list")
    val graftT = tbl("graft")

    // default CSV config mirrors the reference's NewConfig defaults
    // (config.go:230-239) — note header=true there, unlike CsvConfig's
    // bare default
    val csv = CsvConfig(
      separator = str(csvT, "separator", ","),
      delimiter = str(csvT, "delimiter", "\""),
      header = bool(csvT, "header", true),
      notNull = bool(csvT, "not-null", false),
      nullRepr = str(csvT, "null", "\\N"),
      backslashEscape = bool(csvT, "backslash-escape", true),
      trimLastSep = bool(csvT, "trim-last-separator", false),
      charset = str(mydumper, "character-set", "auto"))

    // sql-mode: strict iff STRICT_TRANS_TABLES / STRICT_ALL_TABLES is in
    // the list; the reference's default (mysql.DefaultSQLMode) includes
    // STRICT_TRANS_TABLES, so an absent key means STRICT
    val strMode = str(tidbT, "sql-mode", "STRICT_TRANS_TABLES").toUpperCase
    val sqlMode = if (strMode.contains("STRICT_")) SqlMode.Strict
                  else SqlMode.Lenient

    def pairList(v: Any): Seq[(String, String)] = v match {
      case rows: List[Any @unchecked] => rows.map {
        case m: Map[String @unchecked, Any @unchecked] =>
          (m.getOrElse("db-name", "*").toString,
           m.getOrElse("table-name", "*").toString)
        case other => throw new IllegalArgumentException(
          s"expected a table with db-name/table-name, got $other")
      }
      // a scalar here is a misconfiguration, not an empty filter — an
      // empty filter silently imports EVERY table
      case other => throw new IllegalArgumentException(
        "invalid config: black-white-list do-tables/ignore-tables must " +
          s"be an array of tables, got $other")
    }
    def strList(v: Any): Seq[String] = v match {
      case xs: List[Any @unchecked] => xs.map(_.toString)
      case other => throw new IllegalArgumentException(
        s"invalid config: expected a string array, got $other")
    }
    val filter = TableFilter(
      doTables = bw.get("do-tables").map(pairList).getOrElse(Nil),
      ignoreTables = bw.get("ignore-tables").map(pairList).getOrElse(Nil),
      doDbs = bw.get("do-dbs").map(strList).getOrElse(Nil),
      ignoreDbs = bw.get("ignore-dbs").map(strList).getOrElse(Nil))

    val routes = doc.getOrElse("routes", Nil) match {
      case rows: List[Any @unchecked] => rows.map {
        case m: Map[String @unchecked, Any @unchecked] => RouteRule(
          m.getOrElse("schema-pattern", "").toString,
          m.getOrElse("table-pattern", "").toString,
          m.getOrElse("target-schema", "").toString,
          m.getOrElse("target-table", "").toString)
        case other => throw new IllegalArgumentException(
          s"[[routes]] entries must be tables, got $other")
      }
      case _ => Nil
    }

    // checkpoint driver: file (default) → commit log under outDir;
    // mysql → JDBC store. A jdbc: DSN passes through; a Go-style MySQL
    // DSN or none derives a jdbc:mysql URL from [tidb] (the reference's
    // own fallback, checkpoints.go:321-341)
    val tidbHost = str(tidbT, "host", "127.0.0.1")
    val tidbPort = long(tidbT, "port", 4000L).toInt
    val checkpointUrl = str(cp, "driver", "file") match {
      case "file" => None
      case "mysql" =>
        val dsn = str(cp, "dsn", "")
        Some(if (dsn.startsWith("jdbc:")) dsn
             else s"jdbc:mysql://$tidbHost:$tidbPort/")
      case other => throw new IllegalArgumentException(
        s"invalid config: unknown checkpoint.driver `$other`")
    }

    val cfg = ImportConfig(
      sourceDir = str(mydumper, "data-source-dir", ""),
      outDir = str(graftT, "out-dir", outDir),
      csv = csv,
      charset = str(mydumper, "character-set", "auto"),
      sqlMode = sqlMode,
      filter = filter,
      routes = routes,
      checkpointEnabled = bool(cp, "enable", true),
      checkpointUrl = checkpointUrl,
      // read-block-size is the reference's chunk threshold analog
      // (MinRegionSize, const.go:23); tests drive it down to 1 byte to
      // force many chunks — statement alignment keeps that correct
      minChunkBytes = math.max(1L,
        long(mydumper, "read-block-size", 256L * 1024 * 1024)),
      postAnalyze = bool(post, "analyze", true),
      noSchema = bool(mydumper, "no-schema", false),
      compactTargetBytes =
        if (bool(post, "compact", false) || bool(post, "level-1-compact", false))
          Some(256L * 1024 * 1024)
        else None,
      tableConcurrency = math.max(1, long(app, "table-concurrency", 4L).toInt))

    LoadedTask(
      config = cfg,
      backend = str(importer, "backend", "importer"),
      onDuplicate = str(importer, "on-duplicate", "replace"),
      noSchema = bool(mydumper, "no-schema", false),
      postChecksum = bool(post, "checksum", true),
      keepCheckpointAfterSuccess = bool(cp, "keep-after-success", false),
      tidb = if (tidbT.nonEmpty) Some(TidbTarget(tidbHost, tidbPort,
        str(tidbT, "user", "root"), str(tidbT, "password", ""))) else None,
      warnings = warnings)
  }

  /** Leaf key paths of the parsed doc; empty tables report themselves
    * (an empty `[typo-1]` must still be flagged, as the reference does). */
  private def leafPaths(v: Any, prefix: String = ""): Seq[String] = v match {
    case m: Map[String @unchecked, Any @unchecked] =>
      if (m.isEmpty && prefix.nonEmpty) Seq(prefix)
      else m.toSeq.flatMap { case (k, x) =>
        leafPaths(x, if (prefix.isEmpty) k else s"$prefix.$k")
      }
    case xs: List[Any @unchecked]
        if xs.forall(_.isInstanceOf[Map[_, _]]) => // array of tables
      if (xs.isEmpty || xs.forall(_.asInstanceOf[Map[_, _]].isEmpty)) Seq(prefix)
      else xs.flatMap(leafPaths(_, prefix))
    case _ => Seq(prefix)
  }

  /** Task-Config surface (config.go:62-96 structs): accepted. Mapped
    * keys feed ImportConfig; the rest are deliberate no-ops where Spark
    * or the environment replaces the machinery (worker-pool sizes, cron
    * periods, TLS material, target-DB tuning). */
  private val acceptedExact: Set[String] = Set(
    "lightning.table-concurrency", "lightning.index-concurrency",
    "lightning.region-concurrency", "lightning.io-concurrency",
    "lightning.check-requirements",
    "tidb.host", "tidb.port", "tidb.user", "tidb.password",
    "tidb.status-port", "tidb.pd-addr", "tidb.sql-mode", "tidb.tls",
    "tidb.max-allowed-packet", "tidb.distsql-scan-concurrency",
    "tidb.build-stats-concurrency", "tidb.index-serial-scan-concurrency",
    "tidb.checksum-table-concurrency",
    "tidb.security.ca-path", "tidb.security.cert-path", "tidb.security.key-path",
    "checkpoint.enable", "checkpoint.schema", "checkpoint.dsn",
    "checkpoint.driver", "checkpoint.keep-after-success",
    "mydumper.read-block-size", "mydumper.batch-size",
    "mydumper.batch-import-ratio", "mydumper.data-source-dir",
    "mydumper.no-schema", "mydumper.character-set", "mydumper.case-sensitive",
    "mydumper.csv.separator", "mydumper.csv.delimiter", "mydumper.csv.header",
    "mydumper.csv.trim-last-separator", "mydumper.csv.not-null",
    "mydumper.csv.null", "mydumper.csv.backslash-escape",
    "black-white-list.do-dbs", "black-white-list.ignore-dbs",
    "black-white-list.do-tables.db-name", "black-white-list.do-tables.table-name",
    "black-white-list.ignore-tables.db-name",
    "black-white-list.ignore-tables.table-name",
    // bare pair-list paths: an EMPTY [[...]] entry reports itself as its
    // prefix (leafPaths) and is a legal match-all rule (pairList defaults
    // db/table to "*"), not an unknown option — a WRONG-TYPED value at
    // the same path still fails loudly in pairList itself
    "black-white-list.do-tables", "black-white-list.ignore-tables",
    "tikv-importer.addr", "tikv-importer.backend", "tikv-importer.on-duplicate",
    "post-restore.level-1-compact", "post-restore.compact",
    "post-restore.checksum", "post-restore.analyze",
    "cron.switch-mode", "cron.log-progress",
    "routes.schema-pattern", "routes.table-pattern",
    "routes.target-schema", "routes.target-table",
    "security.ca-path", "security.cert-path", "security.key-path",
    "graft.out-dir")

  private def accepted(path: String): Boolean = acceptedExact(path)

  /** Keys only GlobalConfig decodes (global.go:28-66 + log.Config):
    * legal in a config file, but per-task configs can't change them —
    * warn instead of reject, matching the reference. */
  private val globalOnlyExact: Set[String] = Set(
    "lightning.level", "lightning.file", "lightning.max-size",
    "lightning.max-days", "lightning.max-backups",
    "lightning.status-addr", "lightning.server-mode", "lightning.pprof-port",
    "tidb.log-level")

  private def globalOnly(path: String): Boolean = globalOnlyExact(path)

  /** The sink a loaded task's `tikv-importer.backend` declares.
    * `tidb` → a [[graft.sinks.JdbcSink]] on the MySQL-protocol target
    * from `[tidb]`, with the declared `on-duplicate` verb (reference
    * backend/tidb.go). `importer`/`local` are the scoped-out TiKV-native
    * backends whose analog HERE is the parquet sink → None (the
    * pipeline's default). Invalid combinations fail with the reference's
    * named-message style instead of silently importing to parquet. */
  def sinkFor(task: LoadedTask): Option[graft.sinks.Sink] =
    task.backend match {
      case "tidb" =>
        import graft.sinks.{JdbcSink, OnDuplicate}
        val t = task.tidb.getOrElse(throw new IllegalArgumentException(
          "invalid config: backend = \"tidb\" needs a [tidb] host/port target"))
        val onDup = task.onDuplicate match {
          case "replace" => OnDuplicate.Replace
          case "ignore"  => OnDuplicate.Ignore
          case "error"   => OnDuplicate.Error
          case other => throw new IllegalArgumentException(
            s"invalid config: unsupported `on-duplicate` (`$other`)")
        }
        val props = new java.util.Properties()
        props.setProperty("user", t.user)
        props.setProperty("password", t.password)
        Some(new JdbcSink(s"jdbc:mysql://${t.host}:${t.port}/", props, onDup))
      case "importer" | "local" => None // parquet sink is their analog
      case other => throw new IllegalArgumentException(
        s"invalid config: unsupported `backend` (`$other`)")
    }
}
