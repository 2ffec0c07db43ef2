package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Sequence packing: group documents into training sequences of at most
  * `budget` tokens — the export step between a curated corpus and a
  * trainer's fixed-length batches (greedy next-fit concatenation, the
  * standard alternative to per-document padding waste).
  *
  * Distribution shape: documents are hash-bucketed (buckets = the
  * parallelism unit; a 100 TB corpus uses millions of buckets so every
  * executor packs its own streams), then packed in ONE pass per bucket in
  * a deterministic order — by a caller-supplied shuffle key, typically a
  * hash of the id, which simultaneously gives the random interleave
  * training wants and a reproducible, resume-safe order (same inputs →
  * same sequences on any cluster size, unlike zipWithIndex/repartition
  * tricks that depend on partition layout). The per-bucket walk streams
  * the sorted iterator (flatMapSortedGroups) — nothing is materialized
  * per group, so a bucket larger than memory still packs.
  *
  * Packing is greedy next-fit: a document that would overflow the open
  * sequence closes it and starts the next. A single document larger than
  * the budget gets a sequence of its own (callers chunk oversized docs
  * upstream if that is not acceptable). Exact bin minimization is NP-hard
  * and irrelevant at this scale; next-fit wastes < 1 doc per sequence and
  * needs no second pass.
  */
object Packing {

  /** One packed document: its sequence number within the bucket and its
    * position within that sequence. */
  final case class Packed(doc_id: Long, bucket: Int, seq: Long, pos: Long,
      n_tokens: Long)

  /** Internal walk input (public: the Dataset encoder's generated code
    * instantiates it from outside this object). */
  final case class PackIn(bucket: Int, ord: String, id: Long, tokens: Long)

  /** @param bucketCol int bucket id (hash-derived; uniform → balanced)
    * @param ordCol    deterministic within-bucket order (training shuffle)
    * @param budget    max tokens per packed sequence */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      bucketCol: Column, ordCol: Column, budget: Long): Dataset[Packed] = {
    val spark = df.sparkSession
    import spark.implicits._
    require(budget > 0, s"budget must be positive, got $budget")
    df.select(bucketCol.cast("int").as("bucket"),
        ordCol.cast("string").as("ord"),
        col(idCol).cast("long").as("id"),
        col(tokensCol).cast("long").as("tokens"))
      .as[PackIn]
      .groupByKey(_.bucket)
      .flatMapSortedGroups(col("ord"), col("id")) { (bucket, docs) =>
        var seq = 0L
        var pos = 0L
        var fill = 0L
        docs.map { d =>
          if (fill > 0 && fill + d.tokens > budget) {
            seq += 1; pos = 0L; fill = 0L
          }
          val out = Packed(d.id, bucket, seq, pos, d.tokens)
          pos += 1; fill += d.tokens
          out
        }
      }
  }

  /** Production default: xxhash64 order/buckets (fastest, codegen'd). The
    * gate query supplies md5-derived columns instead so DuckDB can replay
    * the identical walk. */
  def packSequences(df: DataFrame, idCol: String, tokensCol: String,
      buckets: Int, budget: Long): Dataset[Packed] =
    packSequences(df, idCol, tokensCol,
      pmod(xxhash64(col(idCol)), lit(buckets)).cast("int"),
      // independent hash (different seed input) for the interleave order,
      // zero-padded hex so the string sort IS the numeric sort
      lpad(hex(xxhash64(col(idCol), lit(7))), 16, "0"),
      budget)
}
