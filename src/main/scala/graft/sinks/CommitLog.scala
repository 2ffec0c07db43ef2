package graft.sinks

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** K6: resumable-import commit log — the checkpoint role, lakehouse-shaped.
  *
  * The reference persists per-table/engine/chunk status + allocator base +
  * running checksum into MySQL tables or a protobuf file
  * (lightning/checkpoints/checkpoints.go:92-171, 321-451) and merges
  * updates through an async queue (restore.go:367-441). In Spark the unit
  * of restart is a whole table write (task-level retry is Spark's job), so
  * the log is one JSON status document per table under
  * `<outDir>/_state/<db>.<table>.json`, written atomically (temp + rename)
  * on the driver. Statuses mirror CheckpointStatus (checkpoints.go:42-55).
  *
  * Resume = skip tables whose status is `imported` with a matching plan
  * fingerprint; rerun anything else. The pinned `jobTsMicros` keeps
  * CURRENT_TIMESTAMP defaults stable across reruns (restore.go:1323,1759).
  */
final case class TableState(
    db: String, table: String,
    status: String, // loaded | written | imported | failed
    rows: Long,
    checksum: Long, totalBytes: Long, totalKvs: Long,
    planFingerprint: String,
    jobTsMicros: Long)

/** K6 chunk granularity: one state per data-file chunk, so a table that
  * dies at 99% resumes from the last committed chunk instead of zero
  * (reference checkpoints per chunk: (path, offset, rowid, checksum) —
  * checkpoints.go:92-171, tests/checkpoint_chunks/). `tableFp` pins the
  * whole table's input fingerprint AND the chunk-group layout (commit byte
  * target): chunk reuse is only valid while both are unchanged. `files`
  * records the output part-file names this chunk committed (file sinks) —
  * resume deletes any table-dir file not referenced by a committed state,
  * so a crash between the append job and the state write cannot leave
  * duplicate rows behind. */
final case class ChunkState(
    db: String, table: String,
    chunkId: String, // source data-file path
    tableFp: String,
    rows: Long, checksum: Long, totalBytes: Long, totalKvs: Long,
    files: Seq[String] = Nil)

/** The checkpoint-driver contract (reference checkpoints.go:321-451 ships
  * interchangeable MySQL-table / file / null drivers behind CheckpointsDB).
  * Implementations: [[CommitLog]] (one JSON doc per state file — the file
  * driver) and [[JdbcCheckpointStore]] (states in a shared database — the
  * MySQL driver's role, so a fleet of importers can coordinate resume
  * state through the target DB). The null driver is `checkpointEnabled =
  * false`. */
trait CheckpointStore {
  def write(st: TableState): Unit
  /** Record `st` ONLY if no state exists for its (db, table) — the
    * create-exclusive primitive concurrent importers need to agree on a
    * single pinned job timestamp. Returns the state that is authoritative
    * AFTER the call: `st` when this writer won, the existing state when
    * another instance got there first. */
  def writeIfAbsent(st: TableState): TableState
  def read(db: String, table: String): Option[TableState]
  def remove(db: String, table: String): Unit
  def listTables(): Seq[TableState]
  def writeChunk(cs: ChunkState): Unit
  def readChunks(db: String, table: String): Map[String, ChunkState]
  def clearChunks(db: String, table: String): Unit

  /** Sink output root + FS conf, for destroy's partial-output cleanup. */
  protected def sinkOut: (String, Configuration)

  /** ctl error-ignore analog (reference cmd/tidb-lightning-ctl/main.go:
    * 166-215, --checkpoint-error-ignore): clear a table's `failed` status
    * WITHOUT touching its data or chunk states — the next import proceeds
    * and resumes from the committed chunks. The reference likewise resets
    * the status stage in place and keeps everything else. Returns true if
    * a failed state was cleared. */
  def errorIgnore(db: String, table: String): Boolean =
    read(db, table) match {
      case Some(st) if st.status == "failed" =>
        write(st.copy(status = "loaded")); true
      case _ => false
    }

  /** ctl error-destroy analog (reference cmd/tidb-lightning-ctl/main.go:
    * 166-215): drop a table's checkpoint states AND its partial sink
    * output, so the next import starts clean instead of resuming over a
    * half-written failed table. */
  def destroy(db: String, table: String): Unit = {
    remove(db, table)
    clearChunks(db, table)
    val (outDir, conf) = sinkOut
    val dir = new Path(new Path(outDir, db), table)
    val dfs = dir.getFileSystem(conf)
    if (dfs.exists(dir)) dfs.delete(dir, true)
  }
}

final class CommitLog(outDir: String, conf: Configuration)
    extends CheckpointStore {
  private val stateDir = new Path(outDir, "_state")
  private def fs: FileSystem = stateDir.getFileSystem(conf)
  override protected def sinkOut: (String, Configuration) = (outDir, conf)

  private def pathFor(db: String, table: String) =
    new Path(stateDir, s"$db.$table.json")

  // one file per chunk: atomic rename per chunk commit, no read-modify-write
  private def chunkPath(db: String, table: String, chunkId: String) = {
    val h = f"${graft.functions.Crc64.checksum(chunkId.getBytes("UTF-8"))}%016x"
    new Path(stateDir, s"$db.$table.chunk.$h.json")
  }

  def writeChunk(cs: ChunkState): Unit = {
    fs.mkdirs(stateDir)
    val dst = chunkPath(cs.db, cs.table, cs.chunkId)
    val tmp = new Path(stateDir, s".${dst.getName}.tmp")
    val out = fs.create(tmp, true)
    try out.write(chunkToJson(cs).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(dst)) fs.delete(dst, false)
    fs.rename(tmp, dst)
  }

  def readChunks(db: String, table: String): Map[String, ChunkState] = {
    if (!fs.exists(stateDir)) return Map.empty
    val prefix = s"$db.$table.chunk."
    fs.listStatus(stateDir).toSeq
      .filter(st => st.getPath.getName.startsWith(prefix) &&
        st.getPath.getName.endsWith(".json"))
      .flatMap { st =>
        val in = fs.open(st.getPath)
        val j = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
        chunkFromJson(j)
      }
      .map(cs => cs.chunkId -> cs).toMap
  }

  def clearChunks(db: String, table: String): Unit = {
    if (!fs.exists(stateDir)) return
    val prefix = s"$db.$table.chunk."
    fs.listStatus(stateDir).toSeq
      .filter(_.getPath.getName.startsWith(prefix))
      .foreach(st => fs.delete(st.getPath, false))
  }

  private def chunkToJson(s: ChunkState): String = {
    def q(v: String) = "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"db":${q(s.db)},"table":${q(s.table)},"chunkId":${q(s.chunkId)},""" +
      s""""tableFp":${q(s.tableFp)},"rows":${s.rows},"checksum":${s.checksum},""" +
      s""""totalBytes":${s.totalBytes},"totalKvs":${s.totalKvs},""" +
      s""""files":${s.files.map(q).mkString("[", ",", "]")}}"""
  }

  private def chunkFromJson(j: String): Option[ChunkState] = {
    def str(k: String) =
      (s""""$k":"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(j)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    def num(k: String) =
      (s""""$k":(-?\\d+)""").r.findFirstMatchIn(j).map(_.group(1).toLong)
    val files = """"files":\[([^\]]*)\]""".r.findFirstMatchIn(j)
      .map(_.group(1)).filter(_.nonEmpty)
      .map(body => """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(body)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq)
      .getOrElse(Nil)
    for {
      db <- str("db"); table <- str("table"); id <- str("chunkId")
      fp <- str("tableFp"); rows <- num("rows"); cs <- num("checksum")
      tb <- num("totalBytes"); kvs <- num("totalKvs")
    } yield ChunkState(db, table, id, fp, rows, cs, tb, kvs, files)
  }

  def write(st: TableState): Unit = {
    fs.mkdirs(stateDir)
    val tmp = new Path(stateDir, s".${st.db}.${st.table}.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(toJson(st).getBytes(StandardCharsets.UTF_8))
    finally out.close()
    val dst = pathFor(st.db, st.table)
    if (fs.exists(dst)) fs.delete(dst, false)
    fs.rename(tmp, dst)
  }

  def writeIfAbsent(st: TableState): TableState = {
    fs.mkdirs(stateDir)
    val dst = pathFor(st.db, st.table)
    try {
      val out = fs.create(dst, false) // overwrite=false: the loser throws
      try out.write(toJson(st).getBytes(StandardCharsets.UTF_8))
      finally out.close()
      st
    } catch { case _: java.io.IOException =>
      read(st.db, st.table).getOrElse(st)
    }
  }

  def read(db: String, table: String): Option[TableState] = {
    val p = pathFor(db, table)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try fromJson(new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }

  def remove(db: String, table: String): Unit = {
    val p = pathFor(db, table)
    if (fs.exists(p)) fs.delete(p, false)
  }

  /** All table states in the log (chunk states and temp files excluded). */
  def listTables(): Seq[TableState] = {
    if (!fs.exists(stateDir)) return Nil
    fs.listStatus(stateDir).toSeq
      .filter { st =>
        val n = st.getPath.getName
        n.endsWith(".json") && !n.contains(".chunk.") && !n.startsWith(".")
      }
      .flatMap { st =>
        val in = fs.open(st.getPath)
        val j = try new String(in.readAllBytes(), StandardCharsets.UTF_8)
        finally in.close()
        fromJson(j)
      }
      .sortBy(s => (s.db, s.table))
  }

  // minimal flat-JSON codec (no deps)
  private def toJson(s: TableState): String = {
    def q(v: String) = "\"" + v.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    s"""{"db":${q(s.db)},"table":${q(s.table)},"status":${q(s.status)},""" +
      s""""rows":${s.rows},"checksum":${s.checksum},"totalBytes":${s.totalBytes},""" +
      s""""totalKvs":${s.totalKvs},"planFingerprint":${q(s.planFingerprint)},""" +
      s""""jobTsMicros":${s.jobTsMicros}}"""
  }

  private def fromJson(j: String): Option[TableState] = {
    def str(k: String) =
      (s""""$k":"((?:[^"\\\\]|\\\\.)*)"""").r.findFirstMatchIn(j)
        .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\"))
    def num(k: String) =
      (s""""$k":(-?\\d+)""").r.findFirstMatchIn(j).map(_.group(1).toLong)
    for {
      db <- str("db"); table <- str("table"); status <- str("status")
      rows <- num("rows"); cs <- num("checksum"); tb <- num("totalBytes")
      kvs <- num("totalKvs"); fp <- str("planFingerprint"); ts <- num("jobTsMicros")
    } yield TableState(db, table, status, rows, cs, tb, kvs, fp, ts)
  }
}
