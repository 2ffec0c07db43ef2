package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Mergeable-sketch laws the Verify gates cannot see in isolation: the
  * merge identities (sharded build ≡ single-pass build, EXACTLY — max for
  * HLL, sum for CMS/histogram), the one-sided CMS error, and estimator
  * accuracy against exact answers on real tables. The gates
  * (`q_hll_census`, `txt_cms_topk`, `q_hist_quantile`) hash-match the
  * same kernels against a DuckDB single-pass replay, which certifies the
  * arithmetic cross-engine; these specs certify the statistics. */
class SketchesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def lineitem = graft.util.Tables.load(spark, sf, "lineitem")
    .select(col("l_returnflag"), col("l_orderkey"))

  private def tokens = graft.util.Tables.load(spark, sf, "documents")
    .select(col("doc_id"), explode(split(trim(col("text")), "\\s+")).as("tok"))
    .filter(col("tok") =!= "")

  private def regSet(df: org.apache.spark.sql.DataFrame): Set[(String, Int, Int)] =
    df.collect().map(r => (r.getAs[String]("l_returnflag"),
      r.getAs[Int]("bucket"), r.getAs[Int]("r"))).toSet

  test("HLL: merge of disjoint shards equals the single-pass registers") {
    val single = Sketches.hllRegisters(lineitem, Seq("l_returnflag"),
      col("l_orderkey"), 64)
    val sharded = Sketches.hllMerge(
      (0 until 4).map(k => Sketches.hllRegisters(
        lineitem.filter(col("l_orderkey") % 4 === k),
        Seq("l_returnflag"), col("l_orderkey"), 64)),
      Seq("l_returnflag"))
    assert(regSet(sharded) === regSet(single))
  }

  test("HLL: raw estimate within 3 sigma of exact distinct per group") {
    // sigma ~ 1.04/sqrt(64) ~ 13%; exact distincts here are ~1100/group
    val regs = Sketches.hllRegisters(lineitem, Seq("l_returnflag"),
      col("l_orderkey"), 64)
    val summary = Sketches.hllSummary(regs, Seq("l_returnflag"), 64)
    val exact = lineitem.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("n_exact"))
    summary.join(exact, "l_returnflag").collect().foreach { r =>
      val est = r.getAs[Long]("est_raw").toDouble
      val ex = r.getAs[Long]("n_exact").toDouble
      assert(math.abs(est - ex) / ex <= 0.39,
        s"${r.getAs[String]("l_returnflag")}: est=$est exact=$ex")
    }
  }

  test("HLL: linear-counting correction kicks in and lands close on a tiny set") {
    // 30 distinct values out of m=64 registers: v_zero > 0, raw <= 2.5m
    val tiny = spark.range(30).selectExpr("'g' AS g", "id")
    val regs = Sketches.hllRegisters(tiny, Seq("g"), col("id"), 64)
    val est = Sketches.hllEstimate(
      Sketches.hllSummary(regs, Seq("g"), 64), 64).collect().head
    val e = est.getAs[Double]("estimate")
    assert(math.abs(e - 30.0) <= 8.0, s"LC estimate $e too far from 30")
  }

  test("HLL: a value hashing below m saturates the rank without corrupting the summary") {
    // hash32(20412333) = 39 < m = 64 (found by exhaustive search), so its
    // hash quotient w is 0 and rho saturates at wBits + 1 = 27. Under the
    // old 2^wBits summary scale that register's shiftleft(1, 26 - 27)
    // shifted by -1 — Java masking turned it into Long.MIN_VALUE and the
    // whole group's s_scaled/est_raw went negative garbage.
    val vals = (Seq(20412333L) ++ (1L to 50L)).map(v => ("g", v))
    import spark.implicits._
    val df = vals.toDF("g", "v")
    val regs = Sketches.hllRegisters(df, Seq("g"), col("v"), 64)
    val sat = regs.filter(col("r") === 27).collect()
    assert(sat.length === 1, "expected exactly one saturated register")
    assert(sat.head.getAs[Int]("bucket") === 39)
    val s = Sketches.hllSummary(regs, Seq("g"), 64).collect().head
    val sScaled = s.getAs[Long]("s_scaled")
    val estRaw = s.getAs[Long]("est_raw")
    assert(sScaled > 0, s"s_scaled corrupted: $sScaled")
    assert(estRaw > 0 && estRaw < 10000, s"est_raw corrupted: $estRaw")
    // the saturated register contributes exactly 2^(wBits+1-27) = 1
    val others = regs.filter(col("r") =!= 27).collect()
      .map(r => 1L << (27 - r.getAs[Int]("r"))).sum
    val empty = (64L - regs.count()) * (1L << 27)
    assert(sScaled === others + 1L + empty)
  }

  test("HLL: rejects non-power-of-two or out-of-range m") {
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(lineitem, Nil, col("l_orderkey"), 48)
    }
    intercept[IllegalArgumentException] {
      Sketches.hllRegisters(lineitem, Nil, col("l_orderkey"), 1024)
    }
  }

  test("CMS: shard-merge equals single-pass and estimates never undercount") {
    val single = Sketches.cmsCounts(tokens, "tok", 4, 256)
    val merged = Sketches.cmsMerge((0 until 4).map(k =>
      Sketches.cmsCounts(tokens.filter(col("doc_id") % 4 === k), "tok", 4, 256)))
    val s1 = single.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val s2 = merged.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(s2 === s1)
    val cands = tokens.groupBy("tok").agg(count(lit(1)).as("n_exact"))
    val under = Sketches.cmsEstimate(cands, merged, "tok", 4, 256)
      .join(cands, "tok").filter(col("est") < col("n_exact"))
    assert(under.count() === 0, "CMS undercounted a token")
  }

  test("CMS: a candidate absent from the sketched stream estimates 0 (or its collisions), never vanishes") {
    import spark.implicits._
    // tiny stream → sparse 4x256 grid: most cells are absent rows, so a
    // foreign candidate probes at least one empty cell; with the left-join
    // probe it must still appear, with est = min over d including zeros
    val stream = Seq("alpha", "alpha", "beta").toDF("tok")
    val sketch = Sketches.cmsCounts(stream, "tok", 4, 256)
    val cands = Seq("alpha", "beta", "never_seen_token_xyz").toDF("tok")
    val est = Sketches.cmsEstimate(cands, sketch, "tok", 4, 256)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet === Set("alpha", "beta", "never_seen_token_xyz"))
    assert(est("alpha") >= 2 && est("beta") >= 1)
    assert(est("never_seen_token_xyz") === 0,
      s"foreign candidate estimated ${est("never_seen_token_xyz")}")
  }

  test("fixed-point float histogram: shard-merge identity; p50 bin brackets the true median") {
    val ord = graft.util.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey"),
        Sketches.fixedPoint(col("o_totalprice"), 20).as("v"))
    val single = Sketches.logHistogram(ord, col("v"))
    val merged = Sketches.histMerge((0 until 4).map(k =>
      Sketches.logHistogram(ord.filter(col("o_orderkey") % 4 === k), col("v"))))
    val h1 = single.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val h2 = merged.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(h2 === h1)
    val q = Sketches.histQuantiles(spark, merged, Seq(50)).collect().head
    val median = graft.util.Tables.load(spark, sf, "orders")
      .stat.approxQuantile("o_totalprice", Array(0.5), 0.0).head
    val (lo, hi) = (q.getAs[Long]("bin_lo") / 1048576.0,
      q.getAs[Long]("bin_hi") / 1048576.0)
    assert(median >= lo && median <= hi + 1.0 / 1048576,
      s"true median $median outside p50 bin [$lo, $hi]")
  }

  test("fixedPoint rejects negative inputs loudly instead of collapsing them into bin 64") {
    import spark.implicits._
    val df = Seq(0.5, 1.25, -0.3).toDF("v")
    val e = intercept[Exception] {
      df.select(Sketches.fixedPoint(col("v"), 20).as("fp")).collect()
    }
    assert(e.getMessage != null &&
      (e.getMessage.contains("fixedPoint") ||
        Option(e.getCause).exists(c =>
          Option(c.getMessage).exists(_.contains("fixedPoint")))),
      s"unexpected error: $e")
    // the guard costs nothing on the valid domain
    val ok = Seq(0.0, 0.5, 3.75).toDF("v")
      .select(Sketches.fixedPoint(col("v"), 20).as("fp"))
      .collect().map(_.getLong(0)).toSeq
    assert(ok === Seq(0L, 524288L, 3932160L))
    // NULL is an absent row, not a domain violation: propagates as NULL
    val withNull = Seq(Option(2.0), Option.empty[Double]).toDF("v")
      .select(Sketches.fixedPoint(col("v"), 20).as("fp"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(withNull.toSeq === Seq(Some(2097152L), None))
  }

  test("histogram: shard-merge equals single pass; p50 bin holds the true median") {
    val docs = graft.util.Tables.load(spark, sf, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("v"))
    val single = Sketches.logHistogram(docs, col("v"))
    val merged = Sketches.histMerge((0 until 4).map(k =>
      Sketches.logHistogram(docs.filter(col("doc_id") % 4 === k), col("v"))))
    val h1 = single.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val h2 = merged.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(h2 === h1)
    val q = Sketches.histQuantiles(spark, merged, Seq(50)).collect().head
    val median = docs.stat.approxQuantile("v", Array(0.5), 0.0).head.toLong
    assert(median >= q.getAs[Long]("bin_lo") && median <= q.getAs[Long]("bin_hi"),
      s"true median $median outside p50 bin [${q.getAs[Long]("bin_lo")}, " +
        s"${q.getAs[Long]("bin_hi")}]")
    assert(q.getAs[Long]("cum") * 100 >= 50 * q.getAs[Long]("n_total"))
  }
}
