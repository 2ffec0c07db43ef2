package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class LookupExpressionSpec extends SparkSpec {
  import LookupExpressions.stringMapLookup

  test("hit returns the mapped value, miss returns null (never throws)") {
    import spark.implicits._
    val df = Seq("a", "b", "zzz", null).toDF("k")
    val got = df.select(col("k"),
      stringMapLookup(col("k"), Seq("a" -> 1L, "b" -> 2L)).as("v"))
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getLong(1))))
    assert(got.toSeq === Seq(("a", Some(1L)), ("b", Some(2L)),
      ("zzz", None), (null, None)))
  }

  test("probe works inside codegen and interpreted filter alike") {
    import spark.implicits._
    val entries = (0 until 1000).map(i => s"k$i" -> i.toLong)
    val df = (0 until 1000).map(i => s"k$i").toDF("k")
    // aggregate forces evaluation over every row through codegen
    val sum = df.select(sum_distinct(stringMapLookup(col("k"), entries)))
      .collect()(0).getLong(0)
    assert(sum === (0 until 1000).map(_.toLong).sum)
    // and as a join/filter condition (interpreted path is exercised too)
    val n = df.filter(stringMapLookup(col("k"), entries) < 10).count()
    assert(n === 10)
  }
}
