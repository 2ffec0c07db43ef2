package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  test("sampleByHash: deterministic, rate-proportional, id-keyed") {
    import spark.implicits._
    val df = (1L to 10000L).toDF("id")
    val a = Sampling.sampleByHash(df, col("id"), 0.2)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleByHash(df.repartition(13), col("id"), 0.2)
      .collect().map(_.getLong(0)).toSet
    assert(a === b, "sample must not depend on partitioning")
    assert(math.abs(a.size - 2000) < 200, s"~20% expected, got ${a.size}")
    // rate monotonicity: a smaller rate is a subset of a larger one
    val small = Sampling.sampleByHash(df, col("id"), 0.05)
      .collect().map(_.getLong(0)).toSet
    assert(small.subsetOf(a) && small.nonEmpty)
  }

  test("threshold edge rates: 0 keeps nothing, 1 keeps everything") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    assert(Sampling.sampleByHash(df, col("id"), 0.0).count() === 0)
    assert(Sampling.sampleByHash(df, col("id"), 1.0).count() === 500)
  }

  test("stratifiedSample: per-class rates, unlisted classes drop") {
    import spark.implicits._
    val df = (1L to 6000L).map(i =>
      (i, if (i % 3 == 0) "a" else if (i % 3 == 1) "b" else "c"))
      .toDF("id", "cls")
    val out = Sampling.stratifiedSample(df, col("id"), col("cls"),
        Map("a" -> 0.5, "b" -> 0.1))
      .groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!out.contains("c"))
    assert(math.abs(out("a") - 1000) < 150, s"~50% of 2000: ${out("a")}")
    assert(math.abs(out("b") - 200) < 80, s"~10% of 2000: ${out("b")}")
    // the kept 'a' rows are exactly the uniform 0.5 sample of class a
    val uniformA = Sampling.sampleByHash(df.filter(col("cls") === "a"),
      col("id"), 0.5).collect().map(_.getLong(0)).toSet
    val stratA = Sampling.stratifiedSample(df, col("id"), col("cls"),
        Map("a" -> 0.5)).collect().map(_.getLong(0)).toSet
    assert(stratA === uniformA)
  }

  test("hashSplit: exhaustive, disjoint, deterministic, ~right sizes") {
    import spark.implicits._
    val df = (1L to 5000L).toDF("id")
    val out = Sampling.hashSplit(df, col("id"), valFrac = 0.1,
      testFrac = 0.2, seed = 7L)
    val byS = out.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // every row lands in exactly one split (adds a column, drops nothing)
    assert(byS.values.sum === 5000L)
    assert(math.abs(byS("val") - 500) < 120, s"~10%: ${byS("val")}")
    assert(math.abs(byS("test") - 1000) < 160, s"~20%: ${byS("test")}")
    // a rerun assigns every id identically (the no-rand() contract)
    val a1 = out.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val a2 = Sampling.hashSplit(df, col("id"), 0.1, 0.2, seed = 7L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a1 === a2)
    // a different seed reassigns (the split is seed-keyed, not id-fixed)
    val a3 = Sampling.hashSplit(df, col("id"), 0.1, 0.2, seed = 8L)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a1 !== a3)
  }

  test("rebalanceByCaps pins exact per-class counts, keeps unlisted classes whole") {
    import spark.implicits._
    val df = ((1L to 100L).map(i => (i, "en")) ++
      (101L to 130L).map(i => (i, "de")) ++
      (131L to 140L).map(i => (i, "fr"))).toSeq.toDF("id", "cls")
    val out = Sampling.rebalanceByCaps(df, col("id"), col("cls"),
      Map("en" -> 10L, "de" -> 50L))
    val byCls = out.groupBy("cls").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byCls === Map("en" -> 10L, "de" -> 30L, "fr" -> 10L))
    // deterministic: a rerun keeps the SAME ids
    val ids1 = out.select("id").collect().map(_.getLong(0)).sorted.toSeq
    val ids2 = Sampling.rebalanceByCaps(df, col("id"), col("cls"),
      Map("en" -> 10L, "de" -> 50L))
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids1 === ids2)
  }
}
