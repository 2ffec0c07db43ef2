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

  /** Deterministic train/val/test split: the md5 key of (seed ‖ id) maps
    * every row to ONE stable split — no `rand()`, so assignment survives
    * reruns, task retries, repartitioning, and engine changes (the leak
    * that random splits cause: a retried task re-rolls and a val doc
    * silently lands in train). Fractions quantize to the 1/65536
    * hex-prefix grid like [[sampleByHash]]; val takes [0, valThr), test
    * takes [valThr, valThr+testThr), train the rest. Adds `split`. */
  def hashSplit(df: DataFrame, idCol: Column, valFrac: Double,
      testFrac: Double, seed: Long = 0L): DataFrame = {
    require(valFrac >= 0 && testFrac >= 0 && valFrac + testFrac <= 1.0,
      s"val+test fractions must fit in [0,1]: $valFrac + $testFrac")
    val hk = substring(
      md5(concat(lit(seed.toString), lit("|"), idCol.cast("string"))), 1, 4)
    val vq = math.ceil(valFrac * 65536).toLong
    val tq = math.ceil(testFrac * 65536).toLong
    val vThr = if (vq >= 65536L) "g" else f"$vq%04x"
    val tThr = if (vq + tq >= 65536L) "g" else f"${vq + tq}%04x"
    df.withColumn("split",
      when(hk < lit(vThr), lit("val"))
        .when(hk < lit(tThr), lit("test"))
        .otherwise(lit("train")))
  }

  /** Deterministic global training-order shuffle. Feeding a corpus to a
    * trainer in storage order biases every batch (one crawl, one domain);
    * the fix is a reproducible global permutation: order by md5(seed‖id).
    * A literal global sort would funnel everything through one range
    * exchange; the scalable equivalent is (shard, pos): shard = the key's
    * first `shardHexDigits` hex chars (16^d shards, each ~uniform), pos =
    * rank WITHIN the shard (a window partitioned by shard — embarrassingly
    * parallel). Reading shards in name order, rows in pos order IS the
    * md5-ordered permutation, because the shard prefix is the key's own
    * most significant digits. Different `seed` → an independent epoch
    * permutation; every engine, run, and retry agrees (md5, no rand()).
    * Returns the input plus (shard string, pos long). */
  def orderShuffle(df: DataFrame, idCol: Column, seed: Long,
      shardHexDigits: Int = 2): DataFrame = {
    require(shardHexDigits >= 1 && shardHexDigits <= 8,
      s"shardHexDigits must be in [1,8]: $shardHexDigits")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(lit(seed.toString), lit("|"), idCol.cast("string")))
    val w = Window.partitionBy(col("_g_shard")).orderBy(col("_g_key"))
    df.withColumn("_g_key", key)
      .withColumn("_g_shard", substring(col("_g_key"), 1, shardHexDigits))
      .withColumn("pos", row_number().over(w).cast("long"))
      .withColumn("shard", col("_g_shard"))
      .drop("_g_key", "_g_shard")
  }

  /** Temperature-based mixture sampling — the multilingual-LM domain
    * rebalance (sample class c ∝ n_c^α, α<1 upsamples rare domains;
    * arXiv:1901.07291 §3.1, arXiv:1911.02116 §3): a corpus whose classes
    * are counted once (one map-side-combined count shuffle), per-class
    * keep-rates computed DRIVER-side as
    *
    *   r_c = min(1, budget · (n_c^α / Σ n_d^α) / n_c)
    *
    * and applied as deterministic hash thresholds ([[threshold]] quantizes
    * to 1/65536, so a ≤1-ulp pow() disagreement between engines cannot
    * flip a row except exactly AT a quantization boundary). The selection
    * itself is md5-keyed — reruns and engines agree row-for-row. */
  def temperatureMixture(df: DataFrame, idCol: Column, classCol: Column,
      alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    require(budget > 0, s"budget must be positive: $budget")
    val counts = df.groupBy(classCol.as("_g_cls"))
      .agg(count(lit(1)).as("_g_n"))
      .collect().map(r => String.valueOf(r.get(0)) -> r.getLong(1)).toMap
    val z = counts.values.map(n => math.pow(n.toDouble, alpha)).sum
    val rates = counts.map { case (c, n) =>
      c -> math.min(1.0, budget * (math.pow(n.toDouble, alpha) / z) / n)
    }
    stratifiedSample(df, idCol, classCol.cast("string"), rates)
  }

  /** Best-of-domain selection: keep the top `k` rows per class by a
    * score column (quality-ranked mixture construction — "the best N web
    * pages, the best N code files"), deterministic ties via `idCol`. One
    * window shuffle keyed on the class; project before calling if the
    * payload is wide (the payload-light pattern). */
  def topKPerClass(df: DataFrame, classCol: Column, scoreCol: Column,
      idCol: Column, k: Int): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(classCol).orderBy(scoreCol.desc, idCol)
    df.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
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
