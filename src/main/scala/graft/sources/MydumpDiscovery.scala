package graft.sources

import java.util.Locale
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** Mydumper-layout discovery, filtering and routing — driver-side planning.
  *
  * Walks a dump directory, classifies each file, applies the black/white
  * list, applies table-routing rules, and groups data files per target
  * table (reference: lightning/mydump/loader.go:144,160-297 for the walk +
  * classify; loader.go:299-301 + config.go:427-432 for the filter;
  * loader.go:303-372 for routes; tests/routes/ pins shard-merge behavior).
  *
  * This is metadata-only work over O(files) names — it runs on the driver
  * in one FileSystem listing pass (Hadoop FS API, so it works identically
  * on HDFS/S3/local at 100 TB: the *data* is never touched here). The
  * result is an ImportPlan the executors then read in parallel.
  */
sealed trait FileKind
object FileKind {
  case object SchemaCreate extends FileKind // {db}-schema-create.sql
  case object TableSchema extends FileKind  // {db}.{tbl}-schema.sql
  case object SqlData extends FileKind      // {db}.{tbl}(.{part})?.sql
  case object CsvData extends FileKind      // {db}.{tbl}(.{part})?.csv
  case object Ignored extends FileKind      // views, triggers, unknown
}

final case class SourceFile(path: String, db: String, table: String,
    kind: FileKind, part: Option[Int], size: Long)

final case class TablePlan(
    db: String, table: String,
    schemaFile: Option[String],
    dataFiles: Seq[SourceFile], // sorted by (path) — deterministic order
    totalSize: Long)

final case class ImportPlan(tables: Seq[TablePlan], ignored: Seq[SourceFile])

/** One routing rule: rename (schemaPattern, tablePattern) → (target schema,
  * target table). Patterns support mydumper-style `*`/`?` wildcards. */
final case class RouteRule(schemaPattern: String, tablePattern: String,
    targetSchema: String, targetTable: String) {
  private def rx(p: String) =
    ("(?i)^" + java.util.regex.Pattern.quote(p)
      .replace("*", "\\E.*\\Q").replace("?", "\\E.\\Q") + "$").r
  private val sRx = rx(schemaPattern)
  private val tRx = rx(tablePattern)
  def matches(db: String, table: String): Boolean =
    sRx.findFirstIn(db).isDefined && tRx.findFirstIn(table).isDefined
}

final case class TableFilter(
    doTables: Seq[(String, String)] = Nil,   // whitelist (empty = all)
    ignoreTables: Seq[(String, String)] = Nil,
    // db-level lists ([black-white-list] do-dbs / ignore-dbs, tidb-tools
    // filter semantics: schema-level rules apply before table-level ones,
    // and a non-empty do-list shadows the ignore-list at its level)
    doDbs: Seq[String] = Nil,
    ignoreDbs: Seq[String] = Nil) {
  // System schemas always skipped (reference: config.go:427-432).
  private val systemDbs = Set("mysql", "information_schema",
    "performance_schema", "sys")
  private def m(pat: String, v: String) = pat == "*" ||
    pat.equalsIgnoreCase(v)
  def keep(db: String, table: String): Boolean = {
    if (systemDbs.contains(db.toLowerCase(Locale.ROOT))) false
    else if (doDbs.nonEmpty && !doDbs.exists(m(_, db))) false
    else if (doDbs.isEmpty && ignoreDbs.exists(m(_, db))) false
    else if (ignoreTables.exists { case (d, t) => m(d, db) && m(t, table) }) false
    else doTables.isEmpty || doTables.exists { case (d, t) => m(d, db) && m(t, table) }
  }
}

object MydumpDiscovery {

  // {db}-schema-create.sql | {db}.{tbl}-schema.sql | {db}.{tbl}(.{part})?.{sql|csv}
  // (name grammar per reference loader.go:144; extensions case-insensitive —
  // tests/csv uses an uppercase .CSV)
  private val SchemaCreateR = """(?i)^([^.]+)-schema-create\.sql$""".r
  private val ViewTriggerR = """(?i)^.+-schema-(?:view|trigger)\.sql$""".r
  private val TableSchemaR = """(?i)^([^.]+)\.(.+)-schema\.sql$""".r
  private val DataR = """(?i)^([^.]+)\.(.+?)(?:\.(\d+))?\.(sql|csv)$""".r

  def classify(name: String, path: String, size: Long): SourceFile = name match {
    case ViewTriggerR() => SourceFile(path, "", "", FileKind.Ignored, None, size)
    case SchemaCreateR(db) => SourceFile(path, db, "", FileKind.SchemaCreate, None, size)
    case TableSchemaR(db, tbl) => SourceFile(path, db, tbl, FileKind.TableSchema, None, size)
    case DataR(db, tbl, part, ext) =>
      val kind = if (ext.toLowerCase == "sql") FileKind.SqlData else FileKind.CsvData
      SourceFile(path, db, tbl, kind, Option(part).map(_.toInt), size)
    case _ => SourceFile(path, "", "", FileKind.Ignored, None, size)
  }

  def listFiles(dir: String, conf: Configuration = new Configuration()): Seq[SourceFile] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(conf)
    val buf = scala.collection.mutable.ArrayBuffer.empty[SourceFile]
    if (fs.getScheme == "file") {
      // local scheme: java.nio walk. Hadoop's RawLocalFileSystem FileStatus
      // shells out `ls -ld` PER FILE for permission info — a forked process
      // per entry (~4 ms each) that turns a large dump listing into the
      // dominant cost (measured 0.55 s for 130 files; hours at millions).
      val root = java.nio.file.Paths.get(
        Option(p.toUri.getPath).filter(_.nonEmpty).getOrElse(dir))
      val it = java.nio.file.Files.walk(root)
      try {
        it.forEach { q =>
          val a = java.nio.file.Files.readAttributes(q,
            classOf[java.nio.file.attribute.BasicFileAttributes])
          if (a.isRegularFile)
            buf += classify(q.getFileName.toString, q.toAbsolutePath.toString,
              a.size())
        }
      } finally it.close()
    } else {
      val it = fs.listFiles(p, true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile)
          buf += classify(st.getPath.getName, st.getPath.toString, st.getLen)
      }
    }
    buf.toSeq.sortBy(_.path) // lexicographic, like the reference walk
  }

  /** Discover → filter → route → group. Tables sorted by totalSize ascending
    * so small tables are scheduled (and finish) first, mirroring
    * loader.go:216-220. */
  def plan(dir: String,
           filter: TableFilter = TableFilter(),
           routes: Seq[RouteRule] = Nil,
           conf: Configuration = new Configuration()): ImportPlan = {
    val files = listFiles(dir, conf)
    val (classified, ignored0) = files.partition(_.kind != FileKind.Ignored)
    val routed = classified.map { f =>
      if (f.table.isEmpty) f
      else routes.find(_.matches(f.db, f.table)) match {
        case Some(r) => f.copy(db = r.targetSchema, table = r.targetTable)
        case None => f
      }
    }
    val (kept, filtered) = routed.partition(f =>
      f.table.isEmpty || filter.keep(f.db, f.table))
    val byTable = kept.filter(_.table.nonEmpty).groupBy(f => (f.db, f.table))
    val tables = byTable.map { case ((db, tbl), fs) =>
      val data = fs.filter(f => f.kind == FileKind.SqlData || f.kind == FileKind.CsvData)
        .sortBy(_.path)
      TablePlan(db, tbl,
        schemaFile = fs.find(_.kind == FileKind.TableSchema).map(_.path),
        dataFiles = data,
        totalSize = data.map(_.size).sum)
    }.toSeq.sortBy(t => (t.totalSize, t.db, t.table))
    ImportPlan(tables, ignored0 ++ filtered)
  }
}
