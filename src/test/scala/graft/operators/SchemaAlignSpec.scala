package graft.operators

import graft.SparkSpec
import graft.sources.MysqlDdl

class SchemaAlignSpec extends SparkSpec {

  val table = MysqlDdl.parseCreateTable(
    """CREATE TABLE `t` (
      |  `a` tinyint(4) NOT NULL,
      |  `b` int(11) DEFAULT '7',
      |  `s` varchar(10) NOT NULL DEFAULT 'dflt',
      |  `d` decimal(6,2) DEFAULT NULL
      |)""".stripMargin)

  import org.apache.spark.sql.functions._

  private def one(vals: (String, String, String, String), mode: SqlMode) = {
    import spark.implicits._
    val df = Seq(vals).toDF("a", "b", "s", "d")
    SchemaAlign.fromColumns(df, Seq("a", "b", "s", "d"), table, mode).collect()(0)
  }

  test("lenient: overflow clamps (128 → tinyint 127), matching sqlmode=off") {
    val r = one(("128", "3000000000", "ok", "1.5"), SqlMode.Lenient)
    assert(r.getByte(0) === 127.toByte)
    assert(r.getInt(1) === Int.MaxValue)
  }

  test("lenient: fractional rounds, garbage truncates to numeric prefix / 0") {
    assert(one(("1.6", "12abc", "x", "2"), SqlMode.Lenient).getByte(0) === 2.toByte)
    assert(one(("junk", "abc", "x", "2"), SqlMode.Lenient).getByte(0) === 0.toByte)
    assert(one(("-129.7", "0", "x", "2"), SqlMode.Lenient).getByte(0) === -128.toByte)
  }

  test("strict: bad value raises") {
    val e = intercept[Throwable] {
      one(("junk", "1", "x", "2"), SqlMode.Strict)
    }
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(t =>
      Option(t.getMessage).exists(_.contains("CAST_INVALID_INPUT"))))
  }

  test("missing columns take defaults; extra file columns dropped") {
    import spark.implicits._
    val df = Seq(("5", "zz")).toDF("a", "extra")
    val out = SchemaAlign.fromColumns(df, Seq("a", "extra"), table, SqlMode.Lenient)
    val r = out.collect()(0)
    assert(out.columns.toSeq === Seq("a", "b", "s", "d"))
    assert(r.getInt(1) === 7)       // default '7'
    assert(r.getString(2) === "dflt")
    assert(r.isNullAt(3))
  }

  test("array (sql-dump) path with statement column permutation") {
    import spark.implicits._
    val df = Seq(Seq("9", "5")).toDF("vals")
    val out = SchemaAlign.fromArray(df, col("vals"), Some(Seq("b", "a")),
      table, SqlMode.Lenient)
    val r = out.collect()(0)
    assert(r.getByte(0) === 5.toByte) // a came second
    assert(r.getInt(1) === 9)         // b came first
  }
}
