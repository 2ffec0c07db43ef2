package graft.sinks

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** On-duplicate policy (reference: lightning/config/config.go:53-58 —
  * `replace` → REPLACE INTO, `ignore` → INSERT IGNORE, `error` → INSERT). */
sealed trait OnDuplicate { def verb: String }
object OnDuplicate {
  case object Replace extends OnDuplicate { val verb = "REPLACE INTO" }
  case object Ignore extends OnDuplicate { val verb = "INSERT IGNORE INTO" }
  case object Error extends OnDuplicate { val verb = "INSERT INTO" }
}

/** K3: SQL sink building multi-row INSERT/REPLACE statements, bounded by a
  * statement byte budget, executed per partition over plain JDBC.
  *
  * Statement shape and the 1 MiB cap mirror the reference's TiDB backend
  * (lightning/backend/tidb.go:45-316, MaxChunkSize tidb.go:240-245); the
  * literal escaping mirrors its appendSQL (tidb.go:96-225). Spark task
  * retries + REPLACE/IGNORE give the same idempotency the reference gets
  * from its retry loop (backend.go:217-238).
  *
  * Scale: each of the N partitions opens one connection and streams
  * statements — the same bounded-concurrency model as the reference's
  * `region-concurrency` writers. Repartition upstream to size N to what the
  * target DB can absorb.
  */
final class JdbcSink(url: String, props: java.util.Properties,
    onDup: OnDuplicate = OnDuplicate.Replace,
    maxStatementBytes: Int = 1 << 20,
    maxRetries: Int = 3,
    backoffMs: Long = 200L,
    // test/injection seam: a serializable factory overriding DriverManager
    connFactory: Option[() => Connection] = None) extends Sink {

  /** Replaying the same rows is a no-op under REPLACE/IGNORE — the property
    * chunk-level resume needs (a crash between a chunk's write and its
    * state commit re-replays that one chunk). INSERT (OnDuplicate.Error)
    * is non-idempotent by construction, so chunked resume refuses it. */
  def idempotentReplay: Boolean = onDup != OnDuplicate.Error

  /** Post-import ANALYZE (reference analyzeTable, restore.go step 5 of
    * postProcess): one statement on the target so its optimizer sees the
    * bulk-loaded rows. Driver-side, single connection — stats refresh is
    * not data-parallel work. */
  def analyze(db: String, table: String): Unit = {
    val conn = connFactory.getOrElse(
      () => DriverManager.getConnection(url, props))()
    try {
      val st = conn.createStatement()
      try st.execute(s"ANALYZE TABLE `$db`.`$table`") finally st.close()
    } finally conn.close()
  }

  override def write(df: DataFrame, db: String, table: String): WriteResult = {
    val schema = df.schema
    val verb = onDup.verb
    val maxBytes = maxStatementBytes
    val jdbcUrl = url
    val p = props
    val (retries, backoff) = (maxRetries, backoffMs)
    val factory = connFactory
    val counted = df.sparkSession.sparkContext.longAccumulator("rows_written")
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        JdbcSink.writePartition(
          factory.getOrElse(() => DriverManager.getConnection(jdbcUrl, p)),
          verb, db, table, schema, rows, maxBytes,
          n => counted.add(n), retries, backoff)
      }
    }
    WriteResult(s"$db.$table", counted.value, None)
  }
}

object JdbcSink {

  /** P6: datum → SQL literal text (reference appendSQL, tidb.go:96-225). */
  def sqlLiteral(v: Any, dt: DataType): String = v match {
    case null => "NULL"
    case b: Array[Byte] =>
      "x'" + b.map(x => f"$x%02x").mkString + "'"
    case s: String => quoteString(s)
    case d: java.math.BigDecimal => d.toPlainString
    case t: java.sql.Timestamp => quoteString(t.toString)
    case t: java.time.Instant => quoteString(t.toString.replace("T", " ").stripSuffix("Z"))
    case t: java.time.LocalDateTime => quoteString(t.toString.replace("T", " "))
    case d: java.sql.Date => quoteString(d.toString)
    case d: java.time.LocalDate => quoteString(d.toString)
    case b: Boolean => if (b) "1" else "0"
    case f: Float => formatFloat(f.toDouble)
    case f: Double => formatFloat(f)
    case other => other.toString
  }

  /** MySQL `%g`-style float text (tidb.go float path). */
  private def formatFloat(d: Double): String = {
    if (d == d.floor && !d.isInfinite && math.abs(d) < 1e15) {
      val l = d.toLong
      if (l.toDouble == d) return l.toString
    }
    d.toString
  }

  /** Backslash escaping (NO_BACKSLASH_ESCAPES unset — the mydumper norm). */
  def quoteString(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb += '\''
    s.foreach {
      case '\'' => sb ++= "''"
      case '\\' => sb ++= "\\\\"
      case '\u0000' => sb ++= "\\0"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\u001a' => sb ++= "\\Z"
      case c => sb += c
    }
    sb += '\''
    sb.toString
  }

  /** Greedily pack row tuples into statements under the byte cap.
    * Exposed for tests (no live DB needed); `writePartition` executes the
    * same stream over a connection. Returns (statement, rowCount) pairs. */
  def buildStatements(verb: String, db: String, table: String,
      schema: StructType, rows: Iterator[Row],
      maxBytes: Int): Iterator[(String, Long)] = {
    val header = s"$verb `$db`.`$table` (" +
      schema.fieldNames.map(f => s"`$f`").mkString(",") + ") VALUES "
    val tuples = rows.map { r =>
      "(" + schema.fields.indices.map { i =>
        sqlLiteral(r.get(i), schema.fields(i).dataType)
      }.mkString(",") + ")"
    }.buffered
    new Iterator[(String, Long)] {
      override def hasNext: Boolean = tuples.hasNext
      override def next(): (String, Long) = {
        val sb = new StringBuilder(header)
        var n = 0L
        var full = false
        while (!full && tuples.hasNext) {
          val t = tuples.head
          if (n > 0 && sb.length + t.length + 1 > maxBytes) full = true
          else {
            if (n > 0) sb += ','
            sb ++= t
            tuples.next()
            n += 1
          }
        }
        (sb.toString, n)
      }
    }
  }

  /** K4: retryable-error taxonomy (reference common/util.go:186-218).
    * Transient server/connection states retry with backoff; semantic
    * failures (syntax, constraint, duplicate under OnDuplicate.Error) fail
    * the statement — retrying those would never converge. */
  private val RetryableMysqlCodes = Set(
    1040, // ER_CON_COUNT_ERROR: too many connections
    1205, // ER_LOCK_WAIT_TIMEOUT
    1213, // ER_LOCK_DEADLOCK
    2003, // CR_CONN_HOST_ERROR: can't connect
    2006, // CR_SERVER_GONE_ERROR
    2013) // CR_SERVER_LOST: lost connection during query
  def isRetryable(e: Throwable): Boolean = e match {
    case _: java.sql.SQLTransientException => true
    case _: java.sql.SQLRecoverableException => true
    case _: java.sql.SQLNonTransientException => false
    case s: java.sql.SQLException =>
      RetryableMysqlCodes.contains(s.getErrorCode) ||
        Option(s.getCause).exists(isRetryable)
    case _: java.net.SocketException => true
    case _: java.net.SocketTimeoutException => true
    case _: java.io.EOFException => true
    case _ => false
  }

  /** Execute every packed statement, retrying retryable failures up to
    * `maxRetries` times with exponential backoff and a FRESH connection
    * (a dead connection is the dominant retryable cause). Statement-level
    * granularity: an import doesn't lose its partition to one deadlock —
    * and under REPLACE/IGNORE a replayed statement is idempotent, so
    * retries never duplicate (OnDuplicate.Error documents the reference's
    * own caveat: non-idempotent by construction). */
  private[sinks] def writePartition(connFactory: () => Connection,
      verb: String, db: String, table: String, schema: StructType,
      rows: Iterator[Row], maxBytes: Int, onRows: Long => Unit,
      maxRetries: Int = 3, backoffMs: Long = 200L): Unit = {
    // Connection state is lazy: re-establishment is PART of the retried
    // attempt, so a still-down server consumes the retry budget with
    // backoff instead of leaking a closed Statement into the next attempt
    // (which would fail with a non-retryable 'statement closed' error).
    var conn: Connection = null
    var st: java.sql.Statement = null
    def closeQuietly(): Unit = {
      if (st != null) { try st.close() catch { case _: Throwable => () } }
      if (conn != null) { try conn.close() catch { case _: Throwable => () } }
      st = null; conn = null
    }
    def ensureConnected(): Unit = if (st == null) {
      conn = connFactory()
      st = conn.createStatement()
    }
    try {
      buildStatements(verb, db, table, schema, rows, maxBytes).foreach {
        case (sql, n) =>
          var attempt = 0
          var done = false
          while (!done) {
            try { ensureConnected(); st.execute(sql); done = true }
            catch {
              case e: Throwable if isRetryable(e) && attempt < maxRetries =>
                attempt += 1
                closeQuietly() // next attempt reconnects from scratch
                Thread.sleep(backoffMs * (1L << (attempt - 1)))
            }
          }
          onRows(n)
      }
    } finally closeQuietly()
  }
}
