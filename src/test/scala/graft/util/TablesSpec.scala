package graft.util

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pins the events.ts layout dispatch — the seam the 2026-08-13 testdata
  * regeneration broke (TIMESTAMP(NANOS)→TIMESTAMP(MICROS) flipped 9 gates
  * red): whatever physical type the parquet reader hands over, tsMicros
  * must yield the same epoch-µs longs DuckDB's `epoch_us(ts)` computes. */
class TablesSpec extends SparkSpec {

  // NOTE: the legacy nanos-as-long layout only spans ±292 years of 1970,
  // so fixtures stay inside that (no year-0001 extremes)
  private val usWanted = Seq(0L, 1718000000123456L, -1000000L)

  test("legacy layout: TIMESTAMP(NANOS) read as epoch-nanos long") {
    import spark.implicits._
    val df = usWanted.map(_ * 1000L).toDF("ts")
    assert(df.schema("ts").dataType === LongType)
    val got = df.select(Tables.tsMicros(df.schema("ts").dataType).as("us"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === usWanted)
  }

  test("current layout: TIMESTAMP_NTZ (micros, isAdjustedToUTC=false)") {
    import spark.implicits._
    // session TZ is pinned UTC (SparkSpec), matching Verify/Bench — the
    // NTZ→Timestamp cast underneath tsMicros is exact only under that pin
    val df = usWanted.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))
    assert(df.schema("ts").dataType === TimestampNTZType)
    val got = df.select(Tables.tsMicros(df.schema("ts").dataType).as("us"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === usWanted)
  }

  test("plain TIMESTAMP column") {
    import spark.implicits._
    val df = usWanted.map(Tuple1(_)).toDF("us")
      .select(timestamp_micros(col("us")).as("ts"))
    assert(df.schema("ts").dataType === TimestampType)
    val got = df.select(Tables.tsMicros(df.schema("ts").dataType).as("us"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === usWanted)
  }

  test("unsupported physical type fails loudly, not with a wrong answer") {
    intercept[IllegalArgumentException] {
      Tables.tsMicros(StringType)
    }
  }
}
