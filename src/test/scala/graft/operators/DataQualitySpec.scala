package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the declarative constraint suite: metric arithmetic, threshold
  * gating (a failing check must report passed=0, not vanish), null-FK
  * handling, and the single-scan compilation claim for row-local checks. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._
  import DataQuality._

  private def asMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getInt(2))))
      .toMap

  test("metrics and thresholds: failing checks report passed=0") {
    val df = Seq(
      (1L, Some("a"), 0.5), (2L, Some("b"), -1.0),
      (2L, None, 0.2), (4L, Some("d"), 0.9)
    ).toDF("id", "name", "score")
    val rep = asMap(report(df, Seq(
      Unique("id.unique", col("id")),
      Complete("name.complete", col("name"), minFraction = 0.8),
      Satisfies("score.non_negative", col("score") >= 0,
        minFraction = 0.9))))
    assert(rep("id.unique") === ((0.75, 0)))       // 3 distinct / 4 rows
    assert(rep("name.complete") === ((0.75, 0)))   // 3 of 4, below 0.8
    assert(rep("score.non_negative") === ((0.75, 0)))
    val pass = asMap(report(df, Seq(
      Satisfies("score.bounded", abs(col("score")) <= 1.0))))
    assert(pass("score.bounded") === ((1.0, 1)))
  }

  test("pass/fail gates on the UNROUNDED metric, not the display rounding") {
    // metric = 2/3 = 0.6666666666...; round(metric, 9) = 0.666666667.
    // A threshold equal to the ROUNDED value must still FAIL: gating on
    // the rounded metric is how ~5e-10 of violating rows (hundreds, at
    // billions of rows) slip through an exactness constraint.
    val df = Seq(1, 2, 3).toDF("v")
    val rep = asMap(report(df, Seq(
      Satisfies("v.two_thirds", col("v") <= 2, minFraction = 0.666666667))))
    val (metric, passed) = rep("v.two_thirds")
    assert(metric === 0.666666667) // displayed metric still rounded
    assert(passed === 0, "threshold gate leaked through display rounding")
  }

  test("referential integrity: null keys fail, resolved fraction exact") {
    val fact = Seq(Some(1L), Some(2L), Some(9L), None)
      .toDF("fk")
    val dim = Seq(1L, 2L, 3L).toDF("k")
    val rep = asMap(report(fact, Seq(
      RefIntegrity("fact.fk.ref_dim", col("fk"), dim, col("k"),
        minFraction = 0.6))))
    assert(rep("fact.fk.ref_dim") === ((0.5, 0))) // 2 of 4 resolve
  }

  test("row-local checks compile into one aggregate scan") {
    val df = Seq((1L, 2.0), (2L, 3.0)).toDF("id", "v")
    val rep = report(df, Seq(
      Unique("u", col("id")),
      Complete("c", col("v")),
      Satisfies("s", col("v") > 0)))
    val p = rep.queryExecution.executedPlan.toString
    // one scan feeding one partial+final aggregate pair — no per-check jobs
    assert("Scan ExistingRDD|LocalTableScan".r.findAllIn(p)
      .size <= 2, s"more than one input scan (plus threshold table):\n$p")
    assert(rep.count() === 3)
  }
}
