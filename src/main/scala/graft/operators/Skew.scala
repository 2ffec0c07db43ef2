package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (beyond-reference; the 100 TB
  * technique the brief calls out alongside AQE).
  *
  * A join whose key distribution is Zipfian puts one partition hours
  * behind the rest. AQE's skew-join split handles sort-merge joins after
  * the fact; salting handles it STRUCTURALLY: the fact side's hot key is
  * sharded into `salts` sub-keys by a deterministic per-row hash, and the
  * (small) dimension side is replicated once per salt, so the hot key's
  * rows spread over `salts` reducers. Deterministic — the salt derives
  * from data, never from partition ids or randomness, so retries and
  * replans produce identical results.
  */
object Skew {

  /** Equi-join `fact ⋈ dim` on `key`, with the fact side salted into
    * `salts` shards. `saltFrom` must be a fact-side expression that varies
    * within a key (any unique-ish column); the dimension side is exploded
    * `salts`× (keep it broadcast-small or salts modest). */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltFrom: Column, salts: Int = 16): DataFrame = {
    val saltedFact = fact.withColumn("_salt",
      pmod(xxhash64(saltFrom), lit(salts)).cast("int"))
    val saltedDim = dim.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-stage aggregation for a skewed groupBy with an expensive or
    * non-partial-friendly aggregate: stage 1 aggregates (key, salt)
    * shards, stage 2 merges shards per key. `merge` must be algebraic
    * (sum-of-sums, min-of-mins…). For plain built-in aggregates Spark's
    * map-side partial aggregation already does this — use this only when
    * a shuffle-heavy distinct/collect forces whole-key locality. */
  def saltedAgg(df: DataFrame, key: String, saltFrom: Column, salts: Int)(
      partial: Seq[(Column, String)], merge: Seq[(Column, String)]): DataFrame = {
    val stage1 = df
      .withColumn("_salt", pmod(xxhash64(saltFrom), lit(salts)).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(partial.head._1.as(partial.head._2),
        partial.tail.map { case (c, n) => c.as(n) }: _*)
    stage1.groupBy(col(key))
      .agg(merge.head._1.as(merge.head._2),
        merge.tail.map { case (c, n) => c.as(n) }: _*)
  }
}
