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
}
