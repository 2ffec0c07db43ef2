package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact one-pass least squares: the driver-side BigInt Cramer solve must
  * recover an exactly-linear relation to the bit, reject collinear
  * features instead of silently pseudo-inverting, and the fixed-point
  * scoring must reproduce the fit. The cross-engine scoring replay is the
  * `txt_lrfit` gate; this pins the solver itself. */
class LinearFitSpec extends SparkSpec {
  import spark.implicits._

  test("recovers an exactly-linear integer relation to the bit") {
    // y = 7 + 3*x1 - 2*x2 over a non-degenerate integer grid
    val df = (for (a <- 1 to 12; b <- 1 to 7) yield
      (a.toLong, b.toLong, 7L + 3 * a - 2 * b)).toDF("x1", "x2", "y")
    val cs = CorpusStats.linearFitFP(df,
      Seq(lit(1L), col("x1"), col("x2")), col("y"), shiftBits = 20)
    assert(cs === Seq(7L << 20, 3L << 20, -2L << 20))
  }

  test("negative exact coefficients floor correctly (floorDiv, not truncate)") {
    // y = -x1 exactly; -1 * 2^20 must come out as -(2^20), not -(2^20)+1
    val df = (1 to 20).map(i => (i.toLong, -i.toLong)).toDF("x1", "y")
    val cs = CorpusStats.linearFitFP(df, Seq(col("x1")), col("y"), 20)
    assert(cs === Seq(-(1L << 20)))
  }

  test("moment sums beyond Long range stay exact (decimal accumulation, no silent wrap)") {
    // x ~ 3.2e9 over 1000 rows: Σx² ≈ 1e22 >> Long.MAX ≈ 9.2e18, so a
    // Long-typed sum would wrap silently in non-ANSI mode and Cramer
    // would return garbage coefficients; the decimal(38,0) accumulator
    // must still recover y = 2x to the bit
    val df = (1 to 1000).map { i =>
      val x = 3_200_000_000L + i
      (x, 2 * x)
    }.toDF("x1", "y")
    val cs = CorpusStats.linearFitFP(df, Seq(col("x1")), col("y"), 20)
    assert(cs === Seq(2L << 20))
  }

  test("rejects collinear features") {
    val df = (1 to 10).map(i => (i.toLong, 2L * i, 5L * i)).toDF("x1", "x2", "y")
    intercept[IllegalArgumentException] {
      CorpusStats.linearFitFP(df, Seq(col("x1"), col("x2")), col("y"))
    }
  }

  test("fixed-point scoring matches the rational fit within quantization") {
    // noisy relation: quantized prediction within 2^-20 * |x|_1 of the
    // exact rational prediction is automatic; sanity-check the fit is
    // usable (R^2 > 0.9 on the generating relation + bounded noise)
    val df = (0 until 400).map { i =>
      val x1 = (i % 37 + 1).toLong
      val x2 = (i % 11 + 1).toLong
      (x1, x2, 5 * x1 + 9 * x2 + (i % 3 - 1)) // noise in {-1,0,1}
    }.toDF("x1", "x2", "y")
    val feats = Seq(lit(1L), col("x1"), col("x2"))
    val cs = CorpusStats.linearFitFP(df, feats, col("y"), 20)
    val scored = df.withColumn("pred",
      CorpusStats.linearScoreFP(feats, cs).cast("double") / (1L << 20).toDouble)
    val yMean = df.agg(avg(col("y"))).head().getDouble(0)
    val Array(sse, sst) = scored
      .agg(sum(pow(col("y") - col("pred"), 2)),
        sum(pow(col("y") - lit(yMean), 2)))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    assert(1.0 - sse / sst > 0.9, s"fit unusable: R^2 = ${1.0 - sse / sst}")
  }
}
