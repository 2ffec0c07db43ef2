package graft.pipeline

import java.util.concurrent.ConcurrentHashMap

/** Shared progress state behind the server's `/progress/task` and
  * `/progress/table` endpoints — the role of the reference's broadcast
  * progress map (lightning/web/progress.go:1-186, handlers
  * lightning/lightning.go:456-481).
  *
  * Same JSON shape as the reference so its dashboard semantics carry over:
  * `/progress/task` → `{"t":{"db.tbl":{"w":bytesDone,"z":bytesTotal,
  * "s":0|1|2,"m":"error"}},"s":0|1|2,"m":"error"}` where `s` is
  * 0=not-started, 1=running, 2=completed. `w` counts source bytes whose
  * chunk groups have committed — the same unit the reference sums from its
  * chunk checkpoints, and the one that yields an honest ETA (bytes are
  * known up front; row counts aren't).
  *
  * `/progress/table?t=db.tbl` additionally lists per-chunk state (the
  * reference serves the table's checkpoint document there).
  *
  * Writers are the import worker threads (table pool × chunk loop); readers
  * are HTTP handler threads — all fields are volatile/concurrent, no locks
  * on the hot path.
  */
final class ProgressRegistry {
  import scala.jdk.CollectionConverters._

  final class ChunkInfo(val chunkId: String, val bytes: Long) {
    @volatile var status: Int = 0
    @volatile var rows: Long = 0L
  }

  final class TableInfo(val db: String, val table: String,
      val totalBytes: Long) {
    @volatile var status: Int = 0
    @volatile var message: String = ""
    @volatile var written: Long = 0L
    val chunks = new ConcurrentHashMap[String, ChunkInfo]()
  }

  @volatile private var status: Int = 0
  @volatile private var message: String = ""
  private val tables = new ConcurrentHashMap[String, TableInfo]()

  private def key(db: String, table: String) = s"$db.$table"
  private def info(db: String, table: String): Option[TableInfo] =
    Option(tables.get(key(db, table)))

  def startTask(): Unit = { tables.clear(); status = 1; message = "" }

  def endTask(error: Option[String] = None): Unit = {
    status = 2; message = error.getOrElse("")
  }

  /** One entry per planned table, with its total source bytes (known at
    * discovery — the denominator of every progress bar). */
  def initTables(ts: Seq[(String, String, Long)]): Unit =
    ts.foreach { case (db, tbl, z) =>
      tables.put(key(db, tbl), new TableInfo(db, tbl, z))
    }

  def startTable(db: String, table: String): Unit =
    info(db, table).foreach(_.status = 1)

  def startChunk(db: String, table: String, chunkId: String,
      bytes: Long): Unit = info(db, table).foreach { t =>
    t.chunks.computeIfAbsent(chunkId, _ => new ChunkInfo(chunkId, bytes))
      .status = 1
  }

  /** A chunk group committed (or was found already committed on resume):
    * its source bytes count as written. */
  def finishChunk(db: String, table: String, chunkId: String, bytes: Long,
      rows: Long): Unit = info(db, table).foreach { t =>
    val c = t.chunks.computeIfAbsent(chunkId, _ => new ChunkInfo(chunkId, bytes))
    if (c.status != 2) { // idempotent under resume re-reports
      c.status = 2; c.rows = rows
      t.written += bytes // single-writer per table — no CAS needed
    }
  }

  def finishTable(db: String, table: String): Unit =
    info(db, table).foreach { t => t.status = 2; t.written = t.totalBytes }

  def failTable(db: String, table: String, msg: String): Unit =
    info(db, table).foreach { t =>
      t.status = 2; t.message = String.valueOf(msg).take(500)
    }

  private def q(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private def tableEntry(t: TableInfo): String =
    s"""{"w":${t.written},"z":${t.totalBytes},"s":${t.status}""" +
      (if (t.message.nonEmpty) s""","m":${q(t.message)}}""" else "}")

  /** The `/progress/task` document. */
  def taskJson: String = {
    val ts = tables.entrySet().asScala.toSeq.sortBy(_.getKey)
      .map(e => s"${q(e.getKey)}:${tableEntry(e.getValue)}")
      .mkString("{", ",", "}")
    s"""{"t":$ts,"s":$status""" +
      (if (message.nonEmpty) s""","m":${q(message)}}""" else "}")
  }

  /** The `/progress/table?t=name` document; None for an unknown table. */
  def tableJson(name: String): Option[String] =
    Option(tables.get(name)).map { t =>
      val cs = t.chunks.values().asScala.toSeq.sortBy(_.chunkId)
        .map(c => s"""{"id":${q(c.chunkId)},"bytes":${c.bytes},""" +
          s""""rows":${c.rows},"s":${c.status}}""")
        .mkString("[", ",", "]")
      s"""{"name":${q(name)},"w":${t.written},"z":${t.totalBytes},""" +
        s""""s":${t.status},"chunks":$cs}"""
    }
}
