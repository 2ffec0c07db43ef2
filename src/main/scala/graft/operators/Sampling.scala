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

  /** Mixture rebalancing by CAPS, not rates — the training-mix control:
    * keep AT MOST `caps(class)` rows per class, chosen deterministically
    * (md5-of-id rank within the class, so reruns and engines agree), and
    * every row of unlisted classes. Unlike rate sampling this pins exact
    * per-domain counts — "2 parts web, 1 part code, all of wiki" stays
    * true no matter how the crawl grew.
    *
    * Scale shape: one window shuffle keyed on the class column (the rank
    * needs per-class ordering); rows carry only (id, class, rank) through
    * the exchange when callers project first — the payload-light pattern
    * (mine ids, semi-join payloads back) composes exactly like
    * [[Dedup.exactPayloadLight]]. */
  def rebalanceByCaps(df: DataFrame, idCol: Column, classCol: Column,
      caps: Map[String, Long]): DataFrame = {
    require(caps.nonEmpty, "rebalanceByCaps needs at least one class cap")
    import org.apache.spark.sql.expressions.Window
    val cap = caps.foldLeft(lit(null).cast("long")) { case (acc, (cls, c)) =>
      when(classCol === cls, lit(c)).otherwise(acc)
    }
    val w = Window.partitionBy(classCol).orderBy(hashKey(idCol), idCol)
    df.withColumn("_rk", row_number().over(w))
      .filter(cap.isNull || col("_rk") <= cap) // null = uncapped class
      .drop("_rk")
  }
}
