package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable sketch census: the profile pass a 100 TB corpus can afford.
  *
  * Exact `COUNT(DISTINCT x)` / exact heavy hitters / exact quantiles each
  * need a full shuffle of the distinct universe; at corpus scale the
  * answer is a SKETCH built shard-local (map-side combined, bytes per
  * group instead of rows per group) and MERGED associatively — the same
  * reason lake engines keep HLL/tdigest columns in their table stats.
  * Three families, one design rule each:
  *
  *  - HyperLogLog (Flajolet et al. 2007): register = max(rho) per bucket
  *    — merge is element-wise MAX, so sharded build ≡ single-pass build
  *    exactly, not approximately.
  *  - Count-min (Cormode & Muthukrishnan 2005): counts per (row, col) —
  *    merge is element-wise SUM; estimates only ever overcount.
  *  - Log-scale histogram: bin = bit-length of the value — merge is SUM;
  *    quantiles read off the merged cumulative walk.
  *
  * Every kernel is engine-portable integer arithmetic (md5-prefix hash,
  * `bin()` bit-length, fixed-point estimate) so the gates hash-match a
  * DuckDB replay bit-for-bit — no float estimator drift between engines.
  */
object Sketches {

  /** Engine-portable 32-bit hash: first 8 md5 hex chars of the value's
    * decimal/string form (salted for independent rows). Reproducible in
    * any engine with md5 + string ops; value < 2^32 so the decimal
    * string from `conv` always casts to Long exactly. */
  def hash32(e: Column, salt: String = ""): Column = {
    val s = if (salt.isEmpty) e.cast("string") else concat(lit(salt), e.cast("string"))
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")
  }

  private def log2(m: Int): Int = 31 - Integer.numberOfLeadingZeros(m)

  // ------------------------------------------------------------------ HLL

  /** Per-group HLL registers for `valueCol`: one row per non-empty
    * (group, bucket) with the max leading-zero rank. m must be a power of
    * two in [16, 256] (the fixed-point summary needs
    * alpha·m²·2^(wBits+1) to fit a Long — the +1 covers the saturated
    * rank rho = wBits+1 a value hashing below m produces). The
    * aggregation is ONE hash-agg — partial max on the map side means each
    * shard contributes at most m rows per group to the exchange
    * regardless of row count. */
  def hllRegisters(df: DataFrame, groupCols: Seq[String], valueCol: Column,
      m: Int): DataFrame = {
    require(m >= 16 && m <= 256 && Integer.bitCount(m) == 1,
      s"m must be a power of two in [16, 256], got $m")
    val wBits = 32 - log2(m)
    val h = hash32(valueCol)
    val w = (h / m).cast("long") // exact: h, m nonneg
    val rho = when(w === 0, lit(wBits + 1))
      .otherwise(lit(wBits + 1) - length(bin(w)))
    df.select(groupCols.map(col) :+ (h % m).cast("int").as("bucket")
        :+ rho.cast("int").as("rho"): _*)
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max("rho").as("r"))
  }

  /** Merge register sets from disjoint shards: element-wise max. The
    * result is EXACTLY the registers a single pass over the union would
    * produce — the property that makes the sketch a census primitive. */
  def hllMerge(regs: Seq[DataFrame], groupCols: Seq[String]): DataFrame =
    regs.reduce(_.unionByName(_))
      .groupBy(groupCols.map(col) :+ col("bucket"): _*)
      .agg(max("r").as("r"))

  /** Raw-estimate alpha as an exact rational (per Flajolet et al. §4):
    * table values for small m, 0.7213/(1 + 1.079/m) folded to integers
    * for m >= 128. */
  private def alphaRational(m: Int): (Long, Long) = m match {
    case 16 => (673L, 1000L)
    case 32 => (697L, 1000L)
    case 64 => (709L, 1000L)
    case _  => (7213L * m, 10000L * m + 10790L) // 0.7213*m/(m+1.079)
  }

  /** Fixed-point per-group summary from (merged) registers — all-Long
    * arithmetic so any engine reproduces it bit-for-bit:
    * s_scaled = Σ 2^(wBits + 1 − r) over all m registers (empty ⇒ r = 0),
    * est_raw  = ⌊alpha·m²·2^(wBits+1) / s_scaled⌋ (the raw HLL estimate
    * scaled through the same 2^(wBits+1) numerator). The scale is
    * 2^(wBits+1), not 2^wBits, because the rank SATURATES at
    * r = wBits + 1 when a value's hash quotient is 0 (hash < m —
    * probability m/2^32 per distinct value, so invisible in fixtures and
    * near-certain at corpus scale): that register's term is
    * 2^(wBits+1−r) = 1, still integral, where a 2^wBits scale would need
    * a 2^-1 term (and Java's masked shiftleft by −1 would silently
    * produce Long.MIN_VALUE instead). */
  def hllSummary(regs: DataFrame, groupCols: Seq[String], m: Int): DataFrame = {
    val wBits = 32 - log2(m)
    val (aNum, aDen) = alphaRational(m)
    val num = aNum * m * m * (1L << (wBits + 1))
    require(num > 0, s"fixed-point numerator overflow for m=$m")
    regs.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("n_nonzero"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${wBits + 1} - r)")).as("s_part"))
      .select(groupCols.map(col)
        :+ lit(m).as("m")
        :+ col("n_nonzero").cast("long").as("n_nonzero")
        :+ (lit(m) - col("n_nonzero")).cast("long").as("v_zero")
        :+ (col("s_part") + (lit(m.toLong) - col("n_nonzero")) * (1L << (wBits + 1)))
          .cast("long").as("s_scaled"): _*)
      .withColumn("est_raw",
        expr(s"CAST($num AS BIGINT) div (CAST($aDen AS BIGINT) * s_scaled)"))
      .drop("s_part")
  }

  /** Double-precision estimate with the standard small-range linear
    * counting correction — the number a caller reports. The gate pins the
    * integer internals ([[hllSummary]]); this is the API surface, spec'd
    * for accuracy rather than hashed cross-engine (libm `log` is not
    * bit-contracted between engines). */
  def hllEstimate(summary: DataFrame, m: Int): DataFrame = {
    val wBits = 32 - log2(m)
    val raw = col("est_raw").cast("double")
    val lc = lit(m.toDouble) * log(lit(m.toDouble) / col("v_zero").cast("double"))
    summary.withColumn("estimate",
      when(col("v_zero") > 0 && raw <= 2.5 * m, lc).otherwise(raw))
  }

  // ------------------------------------------------------------ count-min

  /** Count-min sketch over a token column: d independent hash rows of
    * width w; counts per (row, col). Merge across shards is element-wise
    * SUM. The exchange carries at most d·w rows per shard — the sketch,
    * not the vocabulary. */
  def cmsCounts(tokens: DataFrame, tokCol: String, d: Int, w: Int): DataFrame = {
    require(d >= 1 && d <= 8 && w >= 16, s"bad cms shape d=$d w=$w")
    tokens.select(posexplode(array(
        (0 until d).map(i => (hash32(col(tokCol), s"${i}_") % w).cast("int")): _*))
        .as(Seq("row", "col")))
      .groupBy("row", "col").agg(count(lit(1)).as("cnt"))
  }

  /** Merge count-min sketches from disjoint shards: element-wise sum —
    * exactly the single-pass sketch over the union. */
  def cmsMerge(sketches: Seq[DataFrame]): DataFrame =
    sketches.reduce(_.unionByName(_))
      .groupBy("row", "col").agg(sum("cnt").as("cnt"))

  /** Point estimates for a candidate set: min over the d rows of the
    * bucket counts — never undercounts (every occurrence landed in each
    * probed cell). The probe join is a LEFT join with absent cells
    * counting as zero: a sparse sketch omits never-hit cells, and a
    * candidate that was not in the sketched stream must estimate 0 (min
    * over its d probes, at least one empty), not drop from the output or
    * take the min of only its occupied probes. Candidates come from the
    * caller (at corpus scale: per-partition top-k survivors, not the full
    * vocabulary). */
  def cmsEstimate(candidates: DataFrame, sketch: DataFrame, tokCol: String,
      d: Int, w: Int): DataFrame =
    candidates.select(col(tokCol), posexplode(array(
        (0 until d).map(i => (hash32(col(tokCol), s"${i}_") % w).cast("int")): _*))
        .as(Seq("row", "col")))
      .join(sketch, Seq("row", "col"), "left")
      .groupBy(tokCol).agg(min(coalesce(col("cnt"), lit(0L))).as("est"))

  // ------------------------------------------------------------ histogram

  /** Log2-scale histogram of a non-negative Long column: bin = bit-length
    * of the value (0 for value 0), i.e. bin b covers [2^(b−1), 2^b − 1].
    * Integer-exact in any engine via `length(bin(v))`; merge = SUM. */
  def logHistogram(df: DataFrame, valueCol: Column): DataFrame =
    df.select(when(valueCol === 0, lit(0))
        .otherwise(length(bin(valueCol.cast("long")))).cast("int").as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("cnt"))

  /** Merge histograms from disjoint shards: per-bin sum. */
  def histMerge(hists: Seq[DataFrame]): DataFrame =
    hists.reduce(_.unionByName(_)).groupBy("bin").agg(sum("cnt").as("cnt"))

  /** Fixed-point shim that puts FLOAT signals (quality scores, prices,
    * cosine distances) onto the mergeable integer histogram:
    * floor(v · 2^shiftBits). Multiplying by a power of two is an exact
    * IEEE exponent shift and floor is bit-contracted, so the binning is
    * engine-portable like every other kernel here — the absolute
    * resolution is 2^-shiftBits, and the read-off bin bounds divide back
    * to exact dyadic doubles. Domain must be non-negative (shift the
    * signal first if it can dip below zero); values above
    * 2^(62-shiftBits) would overflow the Long — far past any score or
    * price domain at the default 20 bits (~4.4e12). Without this, float
    * quantiles fall back to percentile_approx-style full reshuffles of
    * the value column — the one census a curation pipeline reads daily
    * that the sketch family didn't cover. */
  def fixedPoint(e: Column, shiftBits: Int = 20): Column = {
    require(shiftBits >= 0 && shiftBits <= 40, s"bad shiftBits $shiftBits")
    // LOUD domain guard: a negative value would floor to a negative
    // Long, and the histogram's length(bin(v)) on a negative is 64 —
    // every negative silently collapsing into one absurd bin. assert_true
    // evaluates to NULL on success (so the `when` takes the real branch)
    // and throws on the first violating row. NULL inputs pass the guard
    // and propagate as NULL (floor(null) = null) — they are absent rows,
    // not domain violations.
    val ok = assert_true(e.isNull || e.cast("double") >= 0,
      lit("Sketches.fixedPoint: negative input — shift the signal into " +
        "a non-negative domain first"))
    when(ok.isNull,
      floor(e.cast("double") * lit((1L << shiftBits).toDouble)))
      .cast("long")
  }

  /** Quantile read-off from a (merged) histogram: for each requested
    * percentile p, the lowest bin whose cumulative count covers p% of the
    * mass, with the bin's value bounds. The walk runs over BINS (≤ 65 for
    * Long values) — the single-partition window is over sketch cells, not
    * data rows, so it is scale-free by construction. */
  def histQuantiles(spark: SparkSession, hist: DataFrame,
      percentiles: Seq[Int]): DataFrame = {
    import spark.implicits._
    val cum = hist
      .withColumn("cum", sum("cnt").over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(hist.agg(sum("cnt").as("n_total"))))
    val ps = percentiles.toDF("p")
    broadcast(ps).join(cum, col("cum") * 100 >= col("p") * col("n_total"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("p").orderBy("bin")))
      .filter(col("rn") === 1)
      .select(col("p"),
        col("bin"),
        when(col("bin") === 0, lit(0L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), bin - 1)")).as("bin_lo"),
        expr("shiftleft(CAST(1 AS BIGINT), bin) - 1").as("bin_hi"),
        col("cum").cast("long").as("cum"),
        col("n_total").cast("long").as("n_total"))
  }
}
