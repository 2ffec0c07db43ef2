package graft.util

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * Every operator query receives an `sfDir` such as `/root/testdata/sf0.01`
  * and reads only the parquet under it. Filters/projections applied by the
  * caller are pushed to the parquet scan by Catalyst — never pre-collect.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events` with `ts` normalized to epoch microseconds (long) plus a
    * `ts_ts` TimestampType view of it. The file stores TIMESTAMP(NANOS),
    * which Spark reads as epoch-nanos long under
    * `spark.sql.legacy.parquet.nanosAsLong=true` (set by Verify/Bench);
    * DuckDB's parquet reader truncates the same column to µs, so µs is the
    * cross-engine comparison precision.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    load(spark, sfDir, "events")
      .withColumn("ts", expr("ts div 1000"))
      .withColumn("ts_ts", timestamp_micros(col("ts")))
  }

  /** Register all tables as temp views so `spark.sql` mirrors the oracle. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
