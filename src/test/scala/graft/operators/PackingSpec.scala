package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  // single bucket, identity order → the walk is easy to compute by hand
  private def packOne(tokens: Seq[Long], budget: Long) =
    Packing.packSequences(
      tokens.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "n_tokens"),
      "doc_id", "n_tokens",
      bucketCol = lit(0), ordCol = lpad(col("doc_id").cast("string"), 6, "0"),
      budget = budget)
      .collect().sortBy(_.doc_id)

  test("greedy next-fit: overflow doc closes the open sequence") {
    val out = packOne(Seq(100L, 100L, 100L, 60L, 250L, 10L), budget = 256L)
    // 100+100 fits; +100 overflows → seq1; +60 fits; 250 overflows → seq2;
    // 10 overflows (250+10 > 256) → seq3
    assert(out.map(p => (p.seq, p.pos)).toSeq ===
      Seq((0L, 0L), (0L, 1L), (1L, 0L), (1L, 1L), (2L, 0L), (3L, 0L)))
  }

  test("oversized doc gets its own sequence; zero-token docs never split") {
    val out = packOne(Seq(500L, 0L, 0L, 10L), budget = 256L)
    assert(out.map(p => (p.seq, p.pos)).toSeq ===
      Seq((0L, 0L), (1L, 0L), (1L, 1L), (1L, 2L)))
  }

  test("every multi-doc sequence respects the budget; all docs packed once") {
    val n = 500
    val docs = (0 until n).map(i => (i.toLong, (i % 90 + 1).toLong))
      .toDF("doc_id", "n_tokens")
    val out = Packing.packSequences(docs, "doc_id", "n_tokens",
      buckets = 8, budget = 128L).collect()
    assert(out.length === n)
    assert(out.map(_.doc_id).distinct.length === n)
    val overfull = out.groupBy(p => (p.bucket, p.seq))
      .filter { case (_, ps) => ps.length > 1 && ps.map(_.n_tokens).sum > 128L }
    assert(overfull.isEmpty, s"overfull sequences: ${overfull.keys}")
    // positions within each sequence are contiguous from 0
    out.groupBy(p => (p.bucket, p.seq)).foreach { case (_, ps) =>
      assert(ps.map(_.pos).sorted.toSeq === (0L until ps.length.toLong))
    }
  }

  test("packing is deterministic across repartitionings") {
    val docs = (0 until 300).map(i => (i.toLong, (i % 50 + 1).toLong))
      .toDF("doc_id", "n_tokens")
    val a = Packing.packSequences(docs.repartition(7), "doc_id", "n_tokens",
      buckets = 4, budget = 64L).collect().sortBy(_.doc_id).toSeq
    val b = Packing.packSequences(docs.repartition(2), "doc_id", "n_tokens",
      buckets = 4, budget = 64L).collect().sortBy(_.doc_id).toSeq
    assert(a === b)
  }
}
