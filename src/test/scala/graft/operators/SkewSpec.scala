package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain join on a Zipfian key distribution") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = (1 to 2000).map(i =>
      (if (i % 10 == 0) i % 7 else 0, i.toLong, s"p$i"))
      .toDF("k", "row_id", "payload")
    val dim = (0 to 6).map(k => (k, s"dim_$k")).toDF("k", "label")
    val plain = fact.join(dim, "k")
      .select("k", "row_id", "label").collect().map(_.toSeq).sortBy(_.toString)
    val salted = Skew.saltedJoin(fact, dim, "k", col("row_id"), salts = 8)
      .select("k", "row_id", "label").collect().map(_.toSeq).sortBy(_.toString)
    assert(salted.toSeq === plain.toSeq)
    // the join key really includes the salt shard
    val p = Skew.saltedJoin(fact, dim, "k", col("row_id"), salts = 8)
      .queryExecution.executedPlan.toString
    assert(p.contains("_salt"), s"salt not part of the join key:\n$p")
  }

  test("saltedAgg two-stage merge equals direct aggregation") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (if (i % 20 == 0) i % 3 else 0, i.toLong))
      .toDF("k", "v")
    val direct = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), max("v").as("m"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val salted = Skew.saltedAgg(df, "k", col("v"), salts = 8)(
      partial = Seq((sum(col("v")), "s"), (count(lit(1)), "n"), (max(col("v")), "m")),
      merge = Seq((sum(col("s")), "s"), (sum(col("n")), "n"), (max(col("m")), "m")))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    assert(salted.toSeq === direct.toSeq)
  }
}
