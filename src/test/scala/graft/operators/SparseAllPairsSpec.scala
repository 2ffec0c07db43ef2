package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the exact all-pairs similarity search (prefix-filtered TF-IDF
  * cosine, Bayardo 2007):
  * (1) COMPLETENESS — the prefix-filtered result is IDENTICAL to brute
  *     force (every co-occurring pair scored) at the same threshold; the
  *     filter is a candidate-pruning optimization, never a recall trade;
  * (2) the prefix index is strictly smaller than the full postings (the
  *     optimization actually prunes);
  * (3) frequent tokens are pruned hardest — the max per-token indexed
  *     postings list is no longer than the max full postings list, and
  *     the corpus's hottest token indexes fewer docs than it touches
  *     (the ordering-as-skew-defense property the operator doc claims).
  */
class SparseAllPairsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private lazy val postings = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("text").isNotNull).select("doc_id", "text")
    val p = Dedup.tfidfPostings(docs, "doc_id", "text")
      .repartition(col("id")).persist()
    p.count()
    p
  }

  private def pairsOf(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getDouble(2))).toSet

  test("prefix-filtered APSS is identical to brute force at the threshold") {
    val fast = pairsOf(Dedup.sparseAllPairs(postings, 7, 10))
    // brute force: EVERY co-occurring pair is a candidate (pairs sharing
    // no token have cosine 0 and cannot pass any positive threshold)
    val all = postings.select(col("id"), col("tok"))
    val bruteCand = all.as("xa").join(all.as("xb"),
        col("xa.tok") === col("xb.tok") && col("xa.id") < col("xb.id"))
      .select(col("xa.id").as("id_a"), col("xb.id").as("id_b")).distinct()
    val brute = pairsOf(Dedup.scoreSparsePairs(postings, bruteCand, 7, 10))
    assert(fast.nonEmpty, "threshold found no pairs — fixture too sparse")
    assert(fast === brute)
  }

  test("the prefix index prunes, hottest tokens hardest") {
    val idx = Dedup.prefixCandidates(postings, 7, 10)
    // re-derive the index itself (prefixCandidates returns the join) by
    // comparing candidate count against the all-co-occurring count instead
    val nFull = postings.count()
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy("id").orderBy(col("df").asc, col("tok").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val whole = org.apache.spark.sql.expressions.Window.partitionBy("id")
    val indexed = postings
      .withColumn("_cum", sum(col("w") * col("w")).over(byDoc))
      .withColumn("_s2", sum(col("w") * col("w")).over(whole))
      .filter(lit(100L) * (col("_s2") - col("_cum") + col("w") * col("w")) >=
        lit(49L) * col("_s2"))
      .select("id", "tok")
    val nIdx = indexed.count()
    assert(nIdx < nFull, s"index did not prune: $nIdx of $nFull postings")
    // ordering-as-skew-defense: the corpus's hottest token (max df) must
    // index strictly fewer docs than it occurs in
    val hottest = postings.groupBy("tok").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tok")).head()
    val hotTok = hottest.getString(0)
    val hotFull = hottest.getLong(1)
    val hotIdx = indexed.filter(col("tok") === hotTok).count()
    assert(hotIdx < hotFull,
      s"hottest token '$hotTok' not pruned: $hotIdx of $hotFull indexed")
  }

  test("threshold is honored: every reported pair has cosine >= 0.7") {
    val bad = Dedup.sparseAllPairs(postings, 7, 10)
      .filter(col("cos_sim") < 0.7 - 1e-6).count()
    assert(bad === 0)
  }

  test("empty and singleton corpora yield empty pair sets, no crash") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.sparseAllPairs(
      Dedup.tfidfPostings(empty, "doc_id", "text"), 7, 10).count() === 0)
    val one = Seq((1L, "only document here")).toDF("doc_id", "text")
    assert(Dedup.sparseAllPairs(
      Dedup.tfidfPostings(one, "doc_id", "text"), 7, 10).count() === 0)
  }

  test("completeness holds across thresholds on an adversarial synthetic corpus") {
    import spark.implicits._
    // deliberately nasty: exact dups, high-overlap template variants,
    // singleton-rare-token pairs, docs sharing ONLY frequent tokens, and
    // repeated-token docs (tf > 1 paths)
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "alpha beta gamma delta epsilon"), // exact dup of 1
      (3L, "alpha beta gamma delta zeta"),    // 4/5 overlap
      (4L, "alpha beta gamma eta theta"),
      (5L, "iota kappa lambda mu nu"),        // disjoint block
      (6L, "iota kappa lambda mu xi"),
      (7L, "alpha alpha alpha beta beta"),    // tf>1
      (8L, "omicron"),                        // singleton token
      (9L, "omicron pi"),                     // shares the rare singleton
      (10L, "alpha beta")                     // only frequent tokens
    ).toDF("doc_id", "text")
    val p = Dedup.tfidfPostings(docs, "doc_id", "text")
      .repartition(col("id")).persist()
    p.count()
    val all = p.select(col("id"), col("tok"))
    val bruteCand = all.as("xa").join(all.as("xb"),
        col("xa.tok") === col("xb.tok") && col("xa.id") < col("xb.id"))
      .select(col("xa.id").as("id_a"), col("xb.id").as("id_b")).distinct()
    for ((tn, td) <- Seq((5, 10), (7, 10), (9, 10), (99, 100))) {
      val fast = pairsOf(Dedup.sparseAllPairs(p, tn, td))
      val brute = pairsOf(Dedup.scoreSparsePairs(p, bruteCand, tn, td))
      assert(fast === brute, s"mismatch at threshold $tn/$td")
    }
    // the exact-dup pair must survive every threshold (cosine 1.0)
    val top = pairsOf(Dedup.sparseAllPairs(p, 99, 100))
    assert(top.exists(t => t._1 == 1L && t._2 == 2L && t._3 == 1.0))
    p.unpersist()
  }
}
