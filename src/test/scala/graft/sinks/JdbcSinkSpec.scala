package graft.sinks

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class JdbcSinkSpec extends AnyFunSuite {

  val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("price", DoubleType), StructField("blob", BinaryType)))

  test("literal escaping matches MySQL rules") {
    assert(JdbcSink.sqlLiteral(null, StringType) === "NULL")
    assert(JdbcSink.sqlLiteral("it's", StringType) === "'it''s'")
    assert(JdbcSink.sqlLiteral("a\\b\nc", StringType) === "'a\\\\b\\nc'")
    assert(JdbcSink.sqlLiteral(Array[Byte](0x4f, 0x4b), BinaryType) === "x'4f4b'")
    assert(JdbcSink.sqlLiteral(2.5, DoubleType) === "2.5")
    assert(JdbcSink.sqlLiteral(250.0, DoubleType) === "250")
  }

  test("multi-row statement built with verb and quoting") {
    val rows = Iterator(Row(1L, "a", 1.5, null), Row(2L, "b", null, null))
    val stmts = JdbcSink.buildStatements("REPLACE INTO", "db", "t", schema,
      rows, 1 << 20).toList
    assert(stmts.size === 1)
    val (sql, n) = stmts.head
    assert(n === 2)
    assert(sql === "REPLACE INTO `db`.`t` (`id`,`name`,`price`,`blob`) VALUES " +
      "(1,'a',1.5,NULL),(2,'b',NULL,NULL)")
  }

  test("statement byte cap splits batches, never drops rows") {
    val rows = (1 to 100).iterator.map(i => Row(i.toLong, "x" * 50, 1.0, null))
    val stmts = JdbcSink.buildStatements("INSERT INTO", "db", "t", schema,
      rows, maxBytes = 300).toList
    assert(stmts.map(_._2).sum === 100)
    assert(stmts.size > 10)
    assert(stmts.forall(_._1.length <= 360)) // header + ≥1 tuple may overhang
  }

  test("retryable-error taxonomy (K4)") {
    def mysqlErr(code: Int) = new java.sql.SQLException("x", "HY000", code)
    assert(JdbcSink.isRetryable(mysqlErr(1213))) // deadlock
    assert(JdbcSink.isRetryable(mysqlErr(1205))) // lock wait timeout
    assert(JdbcSink.isRetryable(mysqlErr(2013))) // lost connection
    assert(JdbcSink.isRetryable(new java.sql.SQLTransientConnectionException("t")))
    assert(JdbcSink.isRetryable(new java.net.SocketException("reset")))
    assert(!JdbcSink.isRetryable(mysqlErr(1062))) // duplicate key: semantic
    assert(!JdbcSink.isRetryable(mysqlErr(1064))) // syntax error
    assert(!JdbcSink.isRetryable(new java.sql.SQLSyntaxErrorException("s")))
  }

  test("analyze issues ANALYZE TABLE on the target (postProcess step 5)") {
    import java.lang.reflect.{InvocationHandler, Method, Proxy}
    var executed = List.empty[String]
    var closed = 0
    def statement(): java.sql.Statement = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Statement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "execute" =>
              executed ::= args(0).asInstanceOf[String]; java.lang.Boolean.TRUE
            case "close" => closed += 1; null
            case _ => null
          }
      }).asInstanceOf[java.sql.Statement]
    def connection(): java.sql.Connection = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "createStatement" => statement()
            case "close" => closed += 1; null
            case _ => null
          }
      }).asInstanceOf[java.sql.Connection]
    val sink = new JdbcSink("jdbc:unused", new java.util.Properties(),
      connFactory = Some(() => connection()))
    sink.analyze("mdb", "items")
    assert(executed === List("ANALYZE TABLE `mdb`.`items`"))
    assert(closed === 2) // statement + connection both released
  }

  test("statement retry survives transient failures, fails hard errors") {
    import java.lang.reflect.{InvocationHandler, Method, Proxy}
    // a Connection/Statement pair that fails the first N executes
    var failures = 2
    var executed = List.empty[String]
    def statement(): java.sql.Statement = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Statement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "execute" =>
              if (failures > 0) { failures -= 1
                throw new java.sql.SQLException("deadlock", "40001", 1213) }
              executed ::= args(0).asInstanceOf[String]
              java.lang.Boolean.TRUE
            case "close" => null
            case _ => null
          }
      }).asInstanceOf[java.sql.Statement]
    def connection(): java.sql.Connection = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "createStatement" => statement()
            case "close" => null
            case _ => null
          }
      }).asInstanceOf[java.sql.Connection]
    val rows = Iterator(Row(1L, "a", 1.0, null))
    var n = 0L
    JdbcSink.writePartition(() => connection(), "REPLACE INTO", "db", "t",
      schema, rows, 1 << 20, c => n += c, maxRetries = 3, backoffMs = 1L)
    assert(n === 1L && executed.size === 1) // succeeded on 3rd attempt
    // hard (semantic) error propagates without retry
    failures = 0
    var hardCalls = 0
    def hardStatement(): java.sql.Statement = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Statement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "execute" => hardCalls += 1
              throw new java.sql.SQLException("dup", "23000", 1062)
            case _ => null
          }
      }).asInstanceOf[java.sql.Statement]
    def hardConnection(): java.sql.Connection = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Connection]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "createStatement" => hardStatement()
            case _ => null
          }
      }).asInstanceOf[java.sql.Connection]
    val e = intercept[java.sql.SQLException] {
      JdbcSink.writePartition(() => hardConnection(), "INSERT INTO", "db", "t",
        schema, Iterator(Row(2L, "b", 1.0, null)), 1 << 20, _ => (),
        maxRetries = 3, backoffMs = 1L)
    }
    assert(e.getErrorCode === 1062 && hardCalls === 1)
  }

  test("reconnect failure consumes the retry budget instead of aborting") {
    import java.lang.reflect.{InvocationHandler, Method, Proxy}
    // the server is down for the first 2 connection attempts, then back up:
    // the write must retry the CONNECTION with backoff and still succeed
    var connAttempts = 0
    var executed = 0
    def statement(): java.sql.Statement = Proxy.newProxyInstance(
      getClass.getClassLoader, Array(classOf[java.sql.Statement]),
      new InvocationHandler {
        def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
          m.getName match {
            case "execute" => executed += 1; java.lang.Boolean.TRUE
            case _ => null
          }
      }).asInstanceOf[java.sql.Statement]
    def connection(): java.sql.Connection = {
      connAttempts += 1
      if (connAttempts <= 2)
        throw new java.net.SocketException("connection refused")
      Proxy.newProxyInstance(
        getClass.getClassLoader, Array(classOf[java.sql.Connection]),
        new InvocationHandler {
          def invoke(p: Any, m: Method, args: Array[AnyRef]): AnyRef =
            m.getName match {
              case "createStatement" => statement()
              case _ => null
            }
        }).asInstanceOf[java.sql.Connection]
    }
    var n = 0L
    JdbcSink.writePartition(() => connection(), "REPLACE INTO", "db", "t",
      schema, Iterator(Row(1L, "a", 1.0, null)), 1 << 20, c => n += c,
      maxRetries = 3, backoffMs = 1L)
    assert(connAttempts === 3 && executed === 1 && n === 1L)
    // a server that never comes back exhausts the budget and raises the
    // ORIGINAL retryable error, not a misleading 'statement closed'
    connAttempts = 0
    def deadConn(): java.sql.Connection =
      throw new java.net.SocketException("still down")
    val e2 = intercept[java.net.SocketException] {
      JdbcSink.writePartition(() => deadConn(), "REPLACE INTO", "db", "t",
        schema, Iterator(Row(1L, "a", 1.0, null)), 1 << 20, _ => (),
        maxRetries = 2, backoffMs = 1L)
    }
    assert(e2.getMessage === "still down")
  }
}
