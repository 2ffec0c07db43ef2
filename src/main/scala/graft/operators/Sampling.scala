package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, content-addressed sampling for training-data pipelines.
  *
  * `df.sample()` is seed-and-partitioning dependent: a retry, a
  * repartition, or a second run over the same corpus draws a DIFFERENT
  * sample, which breaks dataset reproducibility and dedup-before/after
  * comparisons. Hash-based sampling keys the decision on the ROW (a stable
  * id), so every engine, run, and retry selects the identical subset —
  * and a stratified spec (per-class rates) is just a per-class threshold.
  *
  * The hash is an md5 hex prefix, not xxhash64, deliberately: md5 is the
  * one hash every engine shares, so a sample drawn here can be reproduced
  * (and audited) by DuckDB/anything downstream — same reasoning as the
  * cross-engine sketch gates. 16 hex bits (4 chars) give rate granularity
  * of 1/65536, plenty for sampling; the comparison is a plain string
  * compare (lowercase hex is order-isomorphic to its numeric value).
  */
object Sampling {

  /** The sampling key: first 4 hex chars of md5 of the id rendered as a
    * decimal string. */
  def hashKey(idCol: Column): Column =
    substring(md5(idCol.cast("string")), 1, 4)

  /** Threshold string for a sampling rate: rows with hashKey < threshold
    * are kept; rate is quantized to ceil(rate·65536)/65536. Rate 1.0
    * yields "g", which sorts above every hex key ("10000" would NOT — a
    * 5-char string compares lexicographically, '1' < 'f'). */
  def threshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1]: $rate")
    val q = math.ceil(rate * 65536).toLong
    if (q >= 65536L) "g" else f"$q%04x"
  }

  /** Uniform deterministic sample: keep ~`rate` of rows, keyed on `idCol`. */
  def sampleByHash(df: DataFrame, idCol: Column, rate: Double): DataFrame =
    df.filter(hashKey(idCol) < lit(threshold(rate)))

  /** Stratified deterministic sample: per-class rates (absent classes
    * drop, matching the reference semantics of an explicit spec). */
  def stratifiedSample(df: DataFrame, idCol: Column, classCol: Column,
      rates: Map[String, Double]): DataFrame = {
    require(rates.nonEmpty, "stratifiedSample needs at least one class rate")
    val thr = rates.foldLeft(lit(null).cast("string")) { case (acc, (cls, r)) =>
      when(classCol === cls, lit(threshold(r))).otherwise(acc)
    }
    df.filter(hashKey(idCol) < thr) // null threshold (unlisted class) drops
  }
}
