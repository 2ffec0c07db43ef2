package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DecontamSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "alpha beta gamma delta epsilon"),  // shares "alpha beta gamma" + "beta gamma delta" with eval
    (2L, "zeta eta theta iota"),             // clean
    (3L, "delta epsilon zeta unrelated words here"), // shares "delta epsilon zeta"
    (4L, "short"),                           // < n tokens: whole-remainder gram, no eval hit
    (5L, null: String)                       // null text: excluded, no row
  ).toDF("doc_id", "text")

  private val eval = Seq(
    (100L, "alpha beta gamma delta"),
    (101L, "delta epsilon zeta")
  ).toDF("doc_id", "text")

  test("overlap reports contaminated docs with shared/total gram counts") {
    val out = Decontam.overlap(train, eval, "text", "doc_id", n = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    // doc 1: grams {abg, bgd, gde} — eval has {abg, bgd} (from 100) and
    // {dez} (101); gde is NOT an eval gram (100 stops at delta) → 2 of 3
    assert(out.map(t => (t._1, t._2)).toSeq === Seq((1L, 2L), (3L, 1L)))
    assert(out.find(_._1 == 1L).get._3 === 3L) // 5 tokens → 3 trigrams
    assert(out.find(_._1 == 3L).get._3 === 4L) // 6 tokens → 4 trigrams
  }

  test("clean corpus yields zero rows; eval doc identical to train doc is fully shared") {
    assert(Decontam.overlap(train, Seq((200L, "nothing in common at all"))
      .toDF("doc_id", "text"), "text", "doc_id", n = 3).count() === 0L)
    val full = Decontam.overlap(train,
      Seq((201L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text"),
      "text", "doc_id", n = 3)
      .filter(col("doc_id") === 1L).collect()(0)
    assert(full.getLong(1) === full.getLong(2)) // every gram shared
  }

  test("eval side is broadcast, train side is never shuffled before the join") {
    val plan = Decontam.overlap(train, eval, "text", "doc_id", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }
}
