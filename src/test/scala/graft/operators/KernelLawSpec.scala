package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Law-style checks for the round's small kernels — the properties that
  * hold for ARBITRARY inputs, not the fixtures the gates exercise:
  * marker-name freshness (pure, scalacheck), and the fixed-point /
  * portable-hash bounds over a wide deterministic pseudo-random batch
  * (one Spark job per law, not one per sample). */
class KernelLawSpec extends SparkSpec {
  import spark.implicits._

  test("freshName never collides with the column set, for any adversarial set") {
    val colGen: Gen[String] = Gen.frequency(
      (3, Gen.oneOf("_m", "_m1", "_m2", "_m3", "_o", "_n", "k", "v")),
      (1, Gen.alphaStr.map("_m" + _)),
      (1, Gen.alphaNumStr))
    val prop = Prop.forAll(Gen.listOf(colGen)) { cols =>
      val n = Export.freshName("_m", cols)
      !cols.contains(n) && n.startsWith("_m")
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("fixedPoint bound law: fp <= v*2^k < fp+1 over a wide pseudo-random domain") {
    // deterministic LCG values spanning tiny scores through price-scale
    // magnitudes; the law is floor's defining inequality at 2^20 scale
    val vals = spark.range(2000).selectExpr(
      "CAST((id * 2654435761 % 1000000007) AS DOUBLE) / 1000.0 AS v")
    val checked = vals
      .withColumn("fp", Sketches.fixedPoint(col("v"), 20))
      .withColumn("lhs_ok", col("fp").cast("double") <= col("v") * 1048576.0)
      .withColumn("rhs_ok", col("v") * 1048576.0 < col("fp").cast("double") + 1.0)
    assert(checked.filter(!col("lhs_ok") || !col("rhs_ok")).count() === 0,
      "fixedPoint violated the floor inequality")
    // and monotone: sorting by v sorts by fp
    val pairs = checked.orderBy("v").select("fp").collect().map(_.getLong(0))
    assert(pairs.toSeq === pairs.sorted.toSeq, "fixedPoint not monotone")
  }

  test("hash32 and shardOfWide stay in range over arbitrary longs, including negatives") {
    val vals = spark.range(2000).selectExpr(
      "CAST(id * -987654321987L + 13 AS BIGINT) AS v")
    val checked = vals
      .withColumn("h", Sketches.hash32(col("v")))
      .withColumn("s", Export.shardOfWide(col("v"), 1024))
    assert(checked.filter(col("h") < 0 || col("h") >= 4294967296L).count() === 0,
      "hash32 left [0, 2^32)")
    assert(checked.filter(col("s") < 0 || col("s") >= 1024).count() === 0,
      "shardOfWide left [0, nShards)")
    // and it spreads: far more than one shard populated
    assert(checked.select("s").distinct().count() > 500,
      "wide shard hash not spreading")
  }
}
