package graft

import graft.SparkSpec

class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions: crc64, pack_vec, packed_dot") {
    GraftExtensions.register(spark)
    // golden vector from Crc64Spec: crc64 of "123456789"
    val crc = spark.sql(
      "SELECT crc64(encode('123456789', 'UTF-8')) AS c").collect()(0).getLong(0)
    assert(f"$crc%016X" === "995DC9BBDF1939FA")
    val dot = spark.sql(
      """SELECT packed_dot(pack_vec(CAST(array(1.0, 2.0, 3.0) AS ARRAY<DOUBLE>)),
        |                  pack_vec(CAST(array(4.0, 5.0, 6.0) AS ARRAY<DOUBLE>)))
        |       AS d""".stripMargin).collect()(0).getDouble(0)
    assert(dot === 32.0)
    // the startup-route class wires the same definitions without throwing
    new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
