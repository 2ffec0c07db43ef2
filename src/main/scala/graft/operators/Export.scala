package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data export: the last mile of the curation pipeline. Curated
  * rows land as deterministic SHARDS — the unit downstream dataloaders
  * consume — plus a manifest that certifies what was written.
  *
  * Shard assignment is content-addressed (md5 of the id), not
  * round-robin: reruns and engines agree row-for-row, and adding rows
  * never reshuffles existing assignments' logic. The write is ONE
  * partitioned parquet write (`partitionBy(shard)`) — Spark lays each
  * shard out as its own directory, no per-shard loop, no driver-side
  * routing. The manifest is computed from the WRITTEN files (a read-back
  * scan), not from the input frame — it certifies the bytes on disk, the
  * thing a training job actually reads.
  *
  * 100 TB shape: assignment is a narrow projection; the write shuffles
  * nothing (partitionBy splits files within each task — add a
  * `repartition(shardCol)` upstream only when exactly one file per shard
  * matters more than the shuffle). The manifest pass is one
  * map-side-combined aggregate over the written data.
  */
object Export {

  /** Engine-portable shard id: first md5 hex nibble of the id (as a
    * decimal string) mod `nShards` — the same hash role the sequence
    * packer uses, reproducible in any SQL engine. */
  def shardOf(idCol: org.apache.spark.sql.Column, nShards: Int)
      : org.apache.spark.sql.Column =
    ascii(substring(md5(idCol.cast("string")), 1, 1)) % nShards

  /** Write `df` as `nShards` content-addressed shards under `outDir`,
    * return the certifying manifest: (shard, n_rows, id_sum, id_min,
    * id_max) per shard, read back from the written parquet. */
  def writeShards(spark: SparkSession, df: DataFrame, idCol: String,
      nShards: Int, outDir: String): DataFrame = {
    require(nShards > 0 && nShards <= 16,
      s"one md5 nibble addresses at most 16 shards, got $nShards")
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        sum(col(idCol)).cast("long").as("id_sum"),
        min(col(idCol)).cast("long").as("id_min"),
        max(col(idCol)).cast("long").as("id_max"))
      .select(col("shard").cast("int").as("shard"), col("n_rows"),
        col("id_sum"), col("id_min"), col("id_max"))
  }
}
