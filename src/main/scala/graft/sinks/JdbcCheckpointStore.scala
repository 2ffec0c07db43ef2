package graft.sinks

import java.sql.{Connection, DriverManager}
import org.apache.hadoop.conf.Configuration

/** K6: JDBC-backed checkpoint driver — the role of the reference's
  * MySQL CheckpointsDB (lightning/checkpoints/checkpoints.go:321-451):
  * table/chunk resume state lives in a DATABASE instead of files, so a
  * fleet of importers (or an importer whose scratch dir is ephemeral) can
  * coordinate through the shared target.
  *
  * Two tables, mirroring the reference's table_v6/chunk_v4 split:
  *
  *   graft_table_state(db_name, tbl, status, rows_cnt, checksum,
  *     total_bytes, total_kvs, plan_fp, job_ts)        PK (db_name, tbl)
  *   graft_chunk_state(db_name, tbl, chunk_hash, chunk_id, table_fp,
  *     rows_cnt, checksum, total_bytes, total_kvs, files)
  *                                            PK (db_name, tbl, chunk_hash)
  *
  * SQL is kept to the portable core (no vendor upsert): a state write is
  * DELETE+INSERT inside one transaction — same atomicity the reference
  * gets from its transactional updates, and it runs unchanged on MySQL,
  * Derby (tested — on the Spark classpath) and friends. One connection per
  * operation: checkpoint writes are per-chunk-commit, far off any hot
  * path.
  */
final class JdbcCheckpointStore(connFactory: () => Connection,
    outDir: String, conf: Configuration) extends CheckpointStore {

  def this(url: String, props: java.util.Properties, outDir: String,
      conf: Configuration) =
    this(() => DriverManager.getConnection(url, props), outDir, conf)

  override protected def sinkOut: (String, Configuration) = (outDir, conf)

  private def withConn[A](f: Connection => A): A = {
    val c = connFactory()
    try f(c) finally c.close()
  }

  // CREATE TABLE IF NOT EXISTS is not universal (Derby lacks it): attempt
  // and swallow the duplicate-object error.
  private val ddl = Seq(
    """CREATE TABLE graft_table_state (
      |  db_name VARCHAR(256) NOT NULL, tbl VARCHAR(256) NOT NULL,
      |  status VARCHAR(16) NOT NULL, rows_cnt BIGINT NOT NULL,
      |  checksum BIGINT NOT NULL, total_bytes BIGINT NOT NULL,
      |  total_kvs BIGINT NOT NULL, plan_fp VARCHAR(64) NOT NULL,
      |  job_ts BIGINT NOT NULL,
      |  PRIMARY KEY (db_name, tbl))""".stripMargin,
    """CREATE TABLE graft_chunk_state (
      |  db_name VARCHAR(256) NOT NULL, tbl VARCHAR(256) NOT NULL,
      |  chunk_hash VARCHAR(32) NOT NULL, chunk_id VARCHAR(4096) NOT NULL,
      |  table_fp VARCHAR(64) NOT NULL, rows_cnt BIGINT NOT NULL,
      |  checksum BIGINT NOT NULL, total_bytes BIGINT NOT NULL,
      |  total_kvs BIGINT NOT NULL, files VARCHAR(32000) NOT NULL,
      |  PRIMARY KEY (db_name, tbl, chunk_hash))""".stripMargin)

  withConn { c =>
    val st = c.createStatement()
    try ddl.foreach { sql =>
      try st.execute(sql)
      catch { case e: java.sql.SQLException
        if isAlreadyExists(e) => () }
    } finally st.close()
  }

  /** Derby: X0Y32; MySQL: 1050 ER_TABLE_EXISTS_ERROR; ANSI state 42S01. */
  private def isAlreadyExists(e: java.sql.SQLException): Boolean =
    e.getSQLState == "X0Y32" || e.getErrorCode == 1050 ||
      e.getSQLState == "42S01"

  private def chunkHash(chunkId: String): String =
    f"${graft.functions.Crc64.checksum(chunkId.getBytes("UTF-8"))}%016x"

  /** files list codec: JSON array, same escaping as the file driver. */
  private def encFiles(files: Seq[String]): String =
    files.map(f => "\"" + f.replace("\\", "\\\\").replace("\"", "\\\"") + "\"")
      .mkString("[", ",", "]")
  private def decFiles(s: String): Seq[String] =
    """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(s)
      .map(_.group(1).replace("\\\"", "\"").replace("\\\\", "\\")).toSeq

  /** Transactional DELETE+INSERT — the portable upsert. */
  private def upsert(c: Connection, deleteSql: String,
      delBind: java.sql.PreparedStatement => Unit, insertSql: String,
      insBind: java.sql.PreparedStatement => Unit): Unit = {
    val auto = c.getAutoCommit
    c.setAutoCommit(false)
    try {
      val del = c.prepareStatement(deleteSql)
      try { delBind(del); del.executeUpdate() } finally del.close()
      val ins = c.prepareStatement(insertSql)
      try { insBind(ins); ins.executeUpdate() } finally ins.close()
      c.commit()
    } catch { case e: Throwable =>
      try c.rollback() catch { case _: java.sql.SQLException => () }
      throw e
    } finally c.setAutoCommit(auto)
  }

  override def write(st: TableState): Unit = withConn { c =>
    upsert(c,
      "DELETE FROM graft_table_state WHERE db_name = ? AND tbl = ?",
      p => { p.setString(1, st.db); p.setString(2, st.table) },
      "INSERT INTO graft_table_state VALUES (?,?,?,?,?,?,?,?,?)",
      p => {
        p.setString(1, st.db); p.setString(2, st.table)
        p.setString(3, st.status); p.setLong(4, st.rows)
        p.setLong(5, st.checksum); p.setLong(6, st.totalBytes)
        p.setLong(7, st.totalKvs); p.setString(8, st.planFingerprint)
        p.setLong(9, st.jobTsMicros)
      })
  }

  override def writeIfAbsent(st: TableState): TableState = withConn { c =>
    // plain INSERT: the PRIMARY KEY (db_name, tbl) makes the loser's
    // attempt fail atomically — the DB is the arbiter, no read-then-write
    try {
      val ins = c.prepareStatement(
        "INSERT INTO graft_table_state VALUES (?,?,?,?,?,?,?,?,?)")
      try {
        ins.setString(1, st.db); ins.setString(2, st.table)
        ins.setString(3, st.status); ins.setLong(4, st.rows)
        ins.setLong(5, st.checksum); ins.setLong(6, st.totalBytes)
        ins.setLong(7, st.totalKvs); ins.setString(8, st.planFingerprint)
        ins.setLong(9, st.jobTsMicros)
        ins.executeUpdate()
      } finally ins.close()
      st
    } catch { case e: java.sql.SQLException if isDuplicateKey(e) =>
      readIn(c, st.db, st.table).getOrElse(st)
    }
  }

  /** Derby: 23505; MySQL: 1062 ER_DUP_ENTRY; ANSI state 23xxx. */
  private def isDuplicateKey(e: java.sql.SQLException): Boolean =
    e.getErrorCode == 1062 ||
      Option(e.getSQLState).exists(s => s == "23505" || s.startsWith("23"))

  private def readIn(c: Connection, db: String,
      table: String): Option[TableState] = {
    val q = c.prepareStatement(
      "SELECT * FROM graft_table_state WHERE db_name = ? AND tbl = ?")
    try {
      q.setString(1, db); q.setString(2, table)
      val rs = q.executeQuery()
      try { if (rs.next()) Some(rowToState(rs)) else None }
      finally rs.close()
    } finally q.close()
  }

  private def rowToState(rs: java.sql.ResultSet): TableState =
    TableState(rs.getString(1), rs.getString(2), rs.getString(3),
      rs.getLong(4), rs.getLong(5), rs.getLong(6), rs.getLong(7),
      rs.getString(8), rs.getLong(9))

  override def read(db: String, table: String): Option[TableState] =
    withConn { c =>
      val q = c.prepareStatement(
        "SELECT * FROM graft_table_state WHERE db_name = ? AND tbl = ?")
      try {
        q.setString(1, db); q.setString(2, table)
        val rs = q.executeQuery()
        try { if (rs.next()) Some(rowToState(rs)) else None }
        finally rs.close()
      } finally q.close()
    }

  override def remove(db: String, table: String): Unit = withConn { c =>
    val d = c.prepareStatement(
      "DELETE FROM graft_table_state WHERE db_name = ? AND tbl = ?")
    try { d.setString(1, db); d.setString(2, table); d.executeUpdate() }
    finally d.close()
  }

  override def listTables(): Seq[TableState] = withConn { c =>
    val st = c.createStatement()
    try {
      val rs = st.executeQuery(
        "SELECT * FROM graft_table_state ORDER BY db_name, tbl")
      try {
        val buf = scala.collection.mutable.ArrayBuffer.empty[TableState]
        while (rs.next()) buf += rowToState(rs)
        buf.toSeq
      } finally rs.close()
    } finally st.close()
  }

  override def writeChunk(cs: ChunkState): Unit = withConn { c =>
    val h = chunkHash(cs.chunkId)
    upsert(c,
      "DELETE FROM graft_chunk_state WHERE db_name = ? AND tbl = ? " +
        "AND chunk_hash = ?",
      p => { p.setString(1, cs.db); p.setString(2, cs.table)
        p.setString(3, h) },
      "INSERT INTO graft_chunk_state VALUES (?,?,?,?,?,?,?,?,?,?)",
      p => {
        p.setString(1, cs.db); p.setString(2, cs.table); p.setString(3, h)
        p.setString(4, cs.chunkId); p.setString(5, cs.tableFp)
        p.setLong(6, cs.rows); p.setLong(7, cs.checksum)
        p.setLong(8, cs.totalBytes); p.setLong(9, cs.totalKvs)
        p.setString(10, encFiles(cs.files))
      })
  }

  override def readChunks(db: String, table: String): Map[String, ChunkState] =
    withConn { c =>
      val q = c.prepareStatement(
        "SELECT chunk_id, table_fp, rows_cnt, checksum, total_bytes, " +
          "total_kvs, files FROM graft_chunk_state " +
          "WHERE db_name = ? AND tbl = ?")
      try {
        q.setString(1, db); q.setString(2, table)
        val rs = q.executeQuery()
        try {
          val buf = scala.collection.mutable.ArrayBuffer.empty[ChunkState]
          while (rs.next()) buf += ChunkState(db, table, rs.getString(1),
            rs.getString(2), rs.getLong(3), rs.getLong(4), rs.getLong(5),
            rs.getLong(6), decFiles(rs.getString(7)))
          buf.map(cs => cs.chunkId -> cs).toMap
        } finally rs.close()
      } finally q.close()
    }

  override def clearChunks(db: String, table: String): Unit = withConn { c =>
    val d = c.prepareStatement(
      "DELETE FROM graft_chunk_state WHERE db_name = ? AND tbl = ?")
    try { d.setString(1, db); d.setString(2, table); d.executeUpdate() }
    finally d.close()
  }
}
