package graft.sources

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class MysqlDdlSpec extends AnyFunSuite {

  val peopleDdl: String =
    scala.io.Source.fromResource("mydump/mdb.people-schema.sql").mkString

  test("parses people schema: names, types, nullability") {
    val t = MysqlDdl.parseCreateTable(peopleDdl)
    assert(t.name === "people")
    assert(t.columns.map(_.name) ===
      Seq("id", "name", "age", "balance", "ratio", "status", "joined", "note"))
    assert(t.schema.fields.map(_.dataType).toSeq === Seq(
      LongType, StringType, ByteType, DecimalType(12, 2), DoubleType,
      StringType, TimestampNTZType, StringType))
    assert(!t.column("id").get.nullable)
    assert(t.column("age").get.nullable)
  }

  test("primary key, auto_increment, defaults") {
    val t = MysqlDdl.parseCreateTable(peopleDdl)
    assert(t.primaryKey === Seq("id"))
    assert(t.column("id").get.autoIncrement)
    assert(t.column("balance").get.default === Some("'0.00'"))
    assert(t.column("status").get.default === Some("'idle'"))
    assert(t.column("age").get.default === Some("NULL"))
  }

  test("unsigned bigint maps to decimal(20,0)") {
    val t = MysqlDdl.parseCreateTable(
      "CREATE TABLE `u` (`a` bigint(20) unsigned NOT NULL, `b` int(10) unsigned DEFAULT NULL)")
    assert(t.column("a").get.sparkType === DecimalType(20, 0))
    assert(t.column("a").get.unsigned)
    assert(t.column("b").get.sparkType === LongType)
  }

  test("unique keys parsed; hasReplayKey gates keyless tables") {
    val t = MysqlDdl.parseCreateTable(
      """CREATE TABLE `u` (`a` int(11) NOT NULL, `b` varchar(8), `c` int(11),
        | UNIQUE KEY `uk_ab` (`a`,`b`(4)), UNIQUE (`c`))""".stripMargin)
    assert(t.primaryKey === Nil)
    assert(t.uniqueKeys === Seq(Seq("a", "b"), Seq("c")))
    assert(t.hasReplayKey)
    val keyless = MysqlDdl.parseCreateTable(
      "CREATE TABLE `n` (`a` int(11), `b` varchar(8), KEY `i` (`a`))")
    assert(!keyless.hasReplayKey) // REPLACE replay would duplicate rows
    val pk = MysqlDdl.parseCreateTable(
      "CREATE TABLE `p` (`a` int(11) NOT NULL, PRIMARY KEY (`a`))")
    assert(pk.hasReplayKey && pk.uniqueKeys.isEmpty)
  }

  test("inline primary key and key lines skipped") {
    val t = MysqlDdl.parseCreateTable(
      "CREATE TABLE `k` (`pk` char(36) PRIMARY KEY, `v` json, KEY `i` (`v`(10)))")
    assert(t.primaryKey === Seq("pk"))
    assert(t.columns.map(_.name) === Seq("pk", "v"))
    assert(t.column("v").get.sparkType === StringType)
  }

  test("bare identifiers parse; FULLTEXT/SPATIAL/CHECK never become columns") {
    val t = MysqlDdl.parseCreateTable(
      """CREATE TABLE articles (
        |  id int auto_increment primary key,
        |  body text NOT NULL,
        |  geo point,
        |  FULLTEXT KEY ft (body),
        |  SPATIAL INDEX sp (geo),
        |  CHECK (id > 0)
        |)""".stripMargin)
    assert(t.columns.map(_.name) === Seq("id", "body", "geo"))
    assert(t.primaryKey === Seq("id"))
    assert(t.column("id").get.autoIncrement)
  }

  test("backslash-escaped quotes in defaults don't truncate the column list") {
    val t = MysqlDdl.parseCreateTable(
      """CREATE TABLE q (
        |  `c1` varchar(20) NOT NULL DEFAULT 'it\'s )',
        |  `c2` varchar(20) NOT NULL DEFAULT 'a,b\\',
        |  `c3` int NOT NULL
        |)""".stripMargin)
    assert(t.columns.map(_.name) === Seq("c1", "c2", "c3"))
    assert(t.column("c1").get.default === Some("'it\\'s )'"))
  }

  test("bare columns NAMED like index keywords stay columns") {
    val t = MysqlDdl.parseCreateTable(
      """CREATE TABLE t (
        |  id int,
        |  checksum bigint NOT NULL,
        |  primary_contact varchar(20),
        |  fulltext_score float,
        |  spatial_ref int,
        |  key_name varchar(10)
        |)""".stripMargin)
    assert(t.columns.map(_.name) ===
      Seq("id", "checksum", "primary_contact", "fulltext_score",
        "spatial_ref", "key_name"))
  }

  test("PARTITION BY table options after the body are ignored") {
    val t = MysqlDdl.parseCreateTable(
      "create table a (a int) partition by hash(a) partitions 5;")
    assert(t.columns.map(_.name) === Seq("a"))
  }

  test("table-level AUTO_INCREMENT: '=' optional, >Long.MaxValue clamps") {
    val eq = MysqlDdl.parseCreateTable(
      "CREATE TABLE t (id bigint NOT NULL AUTO_INCREMENT) " +
        "ENGINE=InnoDB AUTO_INCREMENT=70000 DEFAULT CHARSET=utf8;")
    assert(eq.autoIncrementStart === Some(70000L))
    // MySQL grammar: table_option value needs no '='
    val bare = MysqlDdl.parseCreateTable(
      "CREATE TABLE t (id bigint NOT NULL AUTO_INCREMENT) " +
        "ENGINE InnoDB AUTO_INCREMENT 70000;")
    assert(bare.autoIncrementStart === Some(70000L))
    // unsigned 64-bit option value past Long.MaxValue must not throw
    val big = MysqlDdl.parseCreateTable(
      "CREATE TABLE t (id bigint unsigned NOT NULL AUTO_INCREMENT) " +
        "AUTO_INCREMENT=18446744073709551615;")
    assert(big.autoIncrementStart === Some(Long.MaxValue))
  }
}
