package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Crc64ExprSpec extends SparkSpec {
  import spark.implicits._

  test("native expression equals the JVM implementation (codegen path)") {
    val df = Seq("123456789", "hello", "").toDF("s")
      .withColumn("b", encode(col("s"), "UTF-8"))
      .withColumn("crc", Crc64Expr.crc64(col("b")))
    val got = df.select("s", "crc").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("123456789") === 0x995DC9BBDF1939FAL)
    assert(got("hello") === Crc64.checksum("hello".getBytes("UTF-8")))
    assert(got("") === 0L)
  }

  test("crc64 usable from SQL (function registry)") {
    val s2 = spark.newSession()
    // same builder an extensions-enabled session would run
    // (GraftExtensions.injectFunction) — registered against the live
    // registry since the shared test session pre-exists
    s2.sessionState.functionRegistry.createOrReplaceTempFunction(
      "crc64", exprs => Crc64Expr(exprs.head), "built-in")
    val r = s2.sql("SELECT crc64(encode('123456789', 'UTF-8')) AS c")
      .collect()(0).getLong(0)
    assert(r === 0x995DC9BBDF1939FAL)
  }

  test("bit_xor(crc64) aggregate matches Aggregator-based checksum") {
    val df = Seq(("k1", "v1"), ("k2", "v2"), ("k3", "v3")).toDF("k", "v")
      .withColumn("kb", encode(col("k"), "UTF-8"))
      .withColumn("vb", encode(col("v"), "UTF-8"))
    val viaExpr = df
      .withColumn("crc", Crc64Expr.crc64(concat(col("kb"), col("vb"))))
      .agg(expr("bit_xor(crc)")).collect()(0).getLong(0)
    val viaAgg = df.agg(KvChecksum(col("kb"), col("vb")).as("cs"))
      .select("cs.checksum").collect()(0).getLong(0)
    assert(viaExpr === viaAgg)
  }
}
