package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, Row}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributive KV checksum: per row `crc64(key ++ value)`, combined across
  * rows / partitions / tables by XOR, plus total bytes and kv count.
  *
  * XOR is commutative + associative, so the merge is order-free — Spark can
  * compute partial aggregates map-side and combine them in any order, which
  * is exactly why the reference chose it (lightning/verification/checksum.go:
  * 27-101 `UpdateOne/Update/Add`; data/index split at
  * lightning/backend/sql2kv.go:218-239).
  *
  * At 100 TB this aggregation is a single narrow pass: no shuffle of data,
  * only one (checksum, bytes, kvs) triple per partition reaches the driver.
  */
case class ChecksumState(xor: Long, bytes: Long, kvs: Long) {
  def add(that: ChecksumState): ChecksumState =
    ChecksumState(xor ^ that.xor, bytes + that.bytes, kvs + that.kvs)
}

object KvChecksumAgg extends Aggregator[Row, ChecksumState, Row] {
  override def zero: ChecksumState = ChecksumState(0L, 0L, 0L)

  override def reduce(b: ChecksumState, row: Row): ChecksumState = {
    val key = row.getAs[Array[Byte]](0)
    val value = row.getAs[Array[Byte]](1)
    val crc = Crc64.update(Crc64.update(0L, key), value)
    ChecksumState(b.xor ^ crc, b.bytes + key.length + value.length, b.kvs + 1)
  }

  override def merge(a: ChecksumState, b: ChecksumState): ChecksumState = a.add(b)

  override def finish(r: ChecksumState): Row = Row(r.xor, r.bytes, r.kvs)

  override def bufferEncoder: Encoder[ChecksumState] = Encoders.product[ChecksumState]
  override def outputEncoder: Encoder[Row] = {
    import org.apache.spark.sql.types._
    Encoders.row(StructType(Seq(
      StructField("checksum", LongType, nullable = false),
      StructField("total_bytes", LongType, nullable = false),
      StructField("total_kvs", LongType, nullable = false))))
  }
}

object KvChecksum {
  /** Aggregate column over (key binary, value binary) pairs. */
  def apply(key: Column, value: Column): Column =
    udaf(KvChecksumAgg, Encoders.row(
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("key",
          org.apache.spark.sql.types.BinaryType),
        org.apache.spark.sql.types.StructField("value",
          org.apache.spark.sql.types.BinaryType)))))
      .apply(key, value)
}
