package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Laws of [[Similarity.mmrRerank]] the hash-matched `ann_mmr` gate
  * cannot see: structural invariants, order-insensitivity, the λ=1
  * degeneracy, and that diversification actually bites on a
  * near-duplicate pool. */
class MmrSpec extends SparkSpec {
  import spark.implicits._

  // a tiny deterministic pool: two queries, 6 candidates each; vectors
  // chosen so candidates 10/11 are near-identical high-rel twins
  private def pool = {
    val rows = for {
      q <- Seq(0L, 1L)
      (id, vec) <- Seq(
        10L -> Seq(1.0, 0.0, 0.0),
        11L -> Seq(0.999, 0.04, 0.0), // near-twin of 10
        12L -> Seq(0.0, 1.0, 0.0),
        13L -> Seq(0.0, 0.0, 1.0),
        14L -> Seq(0.7, 0.7, 0.0),
        15L -> Seq(0.5, 0.5, 0.7))
    } yield (q, id, vec, vec.head) // rel = first component = cos vs e1
    rows.toDF("q", "id", "v", "rel")
  }

  test("structure: ranks 1..k per query, distinct ids drawn from the pool") {
    val out = Similarity.mmrRerank(pool, "q", "id", "v", "rel",
      k = 4, lambda = 0.7).collect()
    val byQ = out.groupBy(_.getLong(0))
    assert(byQ.keySet === Set(0L, 1L))
    byQ.values.foreach { rows =>
      assert(rows.map(_.getInt(1)).sorted.toSeq === Seq(1, 2, 3, 4))
      val ids = rows.map(_.getLong(2))
      assert(ids.distinct.length === 4)
      assert(ids.forall(id => id >= 10L && id <= 15L))
    }
  }

  test("rank 1 is the pure-relevance argmax; lambda=1 degenerates to relevance order") {
    val out = Similarity.mmrRerank(pool, "q", "id", "v", "rel",
      k = 6, lambda = 1.0)
      .filter(col("q") === 0L).orderBy("rank")
      .collect().map(_.getLong(2)).toSeq
    // rel order: 10 (1.0), 11 (.999), 14 (.7), 15 (.5), 12/13 (0, id tie)
    assert(out === Seq(10L, 11L, 14L, 15L, 12L, 13L))
  }

  test("input row order never changes the selection (greedy is a function of the SET)") {
    val base = Similarity.mmrRerank(pool, "q", "id", "v", "rel",
      k = 4, lambda = 0.5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    val shuffled = Similarity.mmrRerank(
      pool.orderBy(rand(seed = 7)), "q", "id", "v", "rel",
      k = 4, lambda = 0.5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).sorted.toSeq
    assert(shuffled === base)
  }

  test("diversification bites: the near-twin of the top pick is displaced from the top ranks") {
    // pure relevance puts the twins 10 and 11 at ranks 1-2; MMR at
    // λ=0.5 must demote 11 (sim≈1 to the already-picked 10) below the
    // orthogonal candidates
    val top2 = Similarity.mmrRerank(pool, "q", "id", "v", "rel",
      k = 2, lambda = 0.5)
      .filter(col("q") === 0L).orderBy("rank")
      .collect().map(_.getLong(2)).toSeq
    assert(top2.head === 10L, "rank 1 must stay the relevance argmax")
    assert(top2(1) !== 11L,
      s"MMR kept the near-duplicate twin at rank 2: $top2")
  }
}
