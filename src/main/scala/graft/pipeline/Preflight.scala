package graft.pipeline

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

import graft.sources.{FileKind, MydumpDiscovery, MysqlDdl}

/** Step 1 of the reference's fixed 6-step plan — checkRequirements
  * (restore.go:252-287 step list; :1117-1133 implementation;
  * tests/check_requirements). The reference validates the TARGET side
  * (TiDB/PD/TiKV version gates over HTTP) because an old cluster fails
  * mid-import after hours of work; the Spark analog validates everything
  * that can fail before any data moves, on BOTH sides: config
  * combination rules, source discovery, every table's DDL, output
  * writability, disk headroom, and reachability of any JDBC target
  * (checkpoint store). Findings accumulate instead of throwing, so one
  * run shows the operator ALL problems — the reference exits on the
  * first, which on a broken 500-table dump means 500 runs.
  *
  * Driver-side only: discovery listings, DDL parses and filesystem
  * probes — no Spark jobs, so `check` on a 100 TB dump costs seconds.
  */
object Preflight {

  final case class Finding(level: String, check: String, detail: String) {
    override def toString: String = f"[$level%-5s] $check: $detail"
  }
  private def err(c: String, d: String) = Finding("ERROR", c, d)
  private def warn(c: String, d: String) = Finding("WARN", c, d)
  private def info(c: String, d: String) = Finding("INFO", c, d)

  /** Probe a JDBC url with a throwaway `SELECT 1`. Overridable for tests
    * (the same seam `JdbcSink.connFactory` uses). */
  def defaultJdbcProbe(url: String): Either[String, Unit] =
    try {
      val conn = java.sql.DriverManager.getConnection(url)
      try { conn.createStatement().executeQuery("SELECT 1"); Right(()) }
      finally conn.close()
    } catch { case e: Exception => Left(String.valueOf(e.getMessage)) }

  def run(cfg: ImportConfig, hconf: Configuration,
      jdbcProbe: String => Either[String, Unit] = defaultJdbcProbe)
      : Seq[Finding] = {
    val out = Seq.newBuilder[Finding]
    out += info("spark", s"version ${org.apache.spark.SPARK_VERSION}")

    // 1. config combination rules (the reference's config.Adjust rejects)
    val cfgOk =
      try { cfg.validated(); out += info("config", "combination rules pass"); true }
      catch { case e: IllegalArgumentException =>
        out += err("config", String.valueOf(e.getMessage)); false }

    // 2. source discovery (walk + classify + filter + route — driver-side)
    val planOpt =
      try {
        val p = MydumpDiscovery.plan(cfg.sourceDir, cfg.filter, cfg.routes,
          hconf)
        val withData = p.tables.filter(_.dataFiles.nonEmpty)
        val files = withData.flatMap(_.dataFiles)
        val bytes = files.map(_.size).sum
        val csvN = files.count(_.kind == FileKind.CsvData)
        val sqlN = files.count(_.kind == FileKind.SqlData)
        out += info("source", s"${withData.map(_.db).distinct.size} dbs, " +
          s"${withData.size} tables, ${files.size} data files " +
          s"($sqlN sql, $csvN csv), ${bytes / 1048576} MiB")
        if (withData.isEmpty)
          out += err("source", "no tables with data files after " +
            "filtering - nothing to import")
        Some((p, withData, bytes))
      } catch { case e: Exception =>
        out += err("source", String.valueOf(e.getMessage)); None }

    // 3. every table's declared schema must resolve and parse NOW, not at
    // table-restore time hours in
    planOpt.foreach { case (_, tables, _) =>
      var bad = 0
      tables.foreach { t =>
        try {
          t.schemaFile.filterNot(_ => cfg.noSchema) match {
            case Some(sf) =>
              // same charset resolution as the import's readFile
              val p = new Path(sf)
              val sfs = p.getFileSystem(hconf)
              val in = sfs.open(p)
              val bytes = try in.readAllBytes() finally in.close()
              val cs = cfg.charset match {
                case a if a.equalsIgnoreCase("auto") =>
                  graft.sources.SqlDumpSource.detectCharset(bytes)
                case b if b.equalsIgnoreCase("binary") => "ISO-8859-1"
                case other => other
              }
              MysqlDdl.parseCreateTable(
                new String(bytes, java.nio.charset.Charset.forName(cs)))
            case None =>
              if (!cfg.schemaCatalog.contains((t.db, t.table)))
                throw new IllegalStateException(
                  "no *-schema.sql and no schemaCatalog entry")
          }
        } catch { case e: Exception =>
          bad += 1
          if (bad <= 20)
            out += err("schema", s"${t.db}.${t.table}: " +
              String.valueOf(e.getMessage))
        }
      }
      if (bad > 20) out += err("schema", s"... and ${bad - 20} more tables")
      if (bad == 0 && tables.nonEmpty)
        out += info("schema", s"all ${tables.size} table schemas parse")
    }

    // 4. output directory must be creatable and writable
    if (cfgOk) {
      try {
        val outPath = new Path(cfg.outDir)
        val fs = outPath.getFileSystem(hconf)
        fs.mkdirs(outPath)
        val probe = new Path(outPath, "_graft_preflight")
        val s = fs.create(probe, true)
        s.write(1); s.close()
        fs.delete(probe, false)
        out += info("out", s"${cfg.outDir} is writable")
        // 5. disk headroom: staging + final output both land here; parquet
        // usually compresses below source size, but a dump that does not
        // fit is better flagged now than at 97%
        planOpt.foreach { case (_, _, srcBytes) =>
          val st = fs.getStatus(outPath)
          if (st.getRemaining > 0 && st.getRemaining < srcBytes)
            out += warn("disk", s"free space ${st.getRemaining / 1048576} " +
              s"MiB < source ${srcBytes / 1048576} MiB")
          else
            out += info("disk",
              s"free ${st.getRemaining / 1048576} MiB")
        }
      } catch { case e: Exception =>
        out += err("out", s"${cfg.outDir}: " + String.valueOf(e.getMessage))
      }
    }

    // 6. a JDBC checkpoint store must answer before the import depends on
    // it (the closest analog of the reference's target-cluster probes)
    cfg.checkpointUrl.foreach { url =>
      jdbcProbe(url) match {
        case Right(()) => out += info("jdbc", s"$url reachable")
        case Left(msg) => out += err("jdbc", s"$url: $msg")
      }
    }
    out.result()
  }
}
