package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the hot-bucket salt-split guard on every banded pair miner:
  * (1) skew stress — a planted degenerate bucket (hundreds of identical
  *     docs sharing every band key) completes with a BOUNDED candidate
  *     count instead of the unguarded B² blowup;
  * (2) no-op invariance — on a corpus with no hot buckets the guarded
  *     join is bit-identical to a run with the cap effectively off;
  * (3) cluster survival — the salt split loses intra-bucket pairs by
  *     design (~1/splits), but the surviving edges still reconnect the
  *     planted blob into ONE connected component, so keep-one dedup
  *     semantics are unaffected.
  */
class BucketGuardSpec extends SparkSpec {
  import spark.implicits._

  private val hotN = 300
  private val cap = 20

  /** hotN identical docs (one degenerate bucket in every band) plus a few
    * distinct normal docs. */
  private def skewedDocs: DataFrame = {
    val hot = (0 until hotN).map(i =>
      (1000L + i, "the same boilerplate block repeated across every mirror of the crawl"))
    val normal = Seq(
      (1L, "a perfectly ordinary document about spark physical planning"),
      (2L, "another unrelated text concerning parquet column pruning"),
      (3L, "completely different content on shuffle partitioning strategy"))
    (hot ++ normal).toDF("doc_id", "text")
  }

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash: planted hot bucket is salt-split to a bounded pair count") {
    val sigs = Dedup.minhashSignaturesPacked(skewedDocs, "text", "doc_id")
      .persist()
    try {
      val guarded = Dedup.minhashPairsFromPackedSignatures(
        sigs, bucketCap = cap)
      val n = guarded.count()
      // unguarded would mine C(300,2) = 44850 identical-doc pairs; with
      // splits = ceil(300/20) = 15 the per-split ceiling is
      // 15 * C(20,2) = 2850 (hash salting makes splits uneven, so allow
      // 4x headroom — still 4+x below the blowup)
      assert(n > 0, "guard must not kill the bucket entirely")
      assert(n <= 4 * 15 * (cap * (cap - 1) / 2),
        s"pair count $n not bounded — guard inactive?")
      // the blob must stay ONE connected component through the closure
      val labels = Dedup.connectedComponents(
        guarded.select("id_a", "id_b"), "id_a", "id_b")
      val comps = labels.filter(col("id") >= 1000L)
        .select("component").distinct().count()
      assert(comps === 1L,
        s"salt split disconnected the planted blob into $comps components")
    } finally sigs.unpersist()
  }

  test("minhash: guard is a bit-exact no-op when no bucket exceeds the cap") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "totally different words in this one about file formats"),
      (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (5L, "yet another unrelated document mentioning query planning"))
      .toDF("doc_id", "text")
    val sigs = Dedup.minhashSignaturesPacked(docs, "text", "doc_id").persist()
    try {
      val open = Dedup.minhashPairsFromPackedSignatures(
        sigs, bucketCap = Int.MaxValue)
      val guarded = Dedup.minhashPairsFromPackedSignatures(
        sigs, bucketCap = Dedup.DefaultBucketCap)
      assert(pairSet(guarded) === pairSet(open))
      assert(pairSet(guarded).contains((1L, 4L)))
    } finally sigs.unpersist()
  }

  test("simhash: hot bucket bounded, sane corpus untouched") {
    val sk = Dedup.simhashSketches(skewedDocs, "text", "doc_id").persist()
    try {
      val guarded = Dedup.simhashPairsFromSketches(sk, maxHamming = 8,
        bucketCap = cap)
      val n = guarded.count()
      assert(n > 0)
      assert(n <= 4 * 15 * (cap * (cap - 1) / 2))
      val open = Dedup.simhashPairsFromSketches(sk, maxHamming = 8,
        bucketCap = Int.MaxValue)
      // identical docs: every surviving pair must also exist unguarded
      assert(pairSet(guarded).subsetOf(pairSet(open)))
    } finally sk.unpersist()
  }

  test("cross-corpus: product blowup salt-split, one-sided buckets unguarded") {
    val base = (0 until hotN).map(i =>
      (2000L + i, "the same boilerplate block repeated across every mirror of the crawl"))
      .toDF("doc_id", "text")
    val fresh = (0 until hotN).map(i =>
      (5000L + i, "the same boilerplate block repeated across every mirror of the crawl"))
      .toDF("doc_id", "text")
    val bs = Dedup.minhashSignaturesPacked(base, "text", "doc_id").persist()
    val fs = Dedup.minhashSignaturesPacked(fresh, "text", "doc_id").persist()
    try {
      val guarded = Dedup.crossMinhashPairsFromPackedSignatures(
        fs, bs, bucketCap = cap)
      val n = guarded.count()
      // unguarded would emit 300*300 = 90000 pairs; splits = 15 keeps
      // ~1/15 of them (uneven hash split → 4x headroom)
      assert(n > 0)
      assert(n <= 4 * 90000 / 15, s"cross pair count $n not bounded")
      // a bucket hot on ONE side only (small product) stays unsalted:
      // 2 fresh docs vs the 300-doc base bucket with a cap covering the
      // product → every pair mined
      val two = Dedup.minhashSignaturesPacked(
        Seq((9000L, "the same boilerplate block repeated across every mirror of the crawl"),
          (9001L, "the same boilerplate block repeated across every mirror of the crawl"))
          .toDF("doc_id", "text"), "text", "doc_id")
      val unsalted = Dedup.crossMinhashPairsFromPackedSignatures(
        two, bs, bucketCap = 1000)
      assert(unsalted.count() === 2L * hotN)
    } finally { bs.unpersist(); fs.unpersist() }
  }

  test("semDedup: hot k-means cell bounded without losing the cluster") {
    // a degenerate semantic blob: hotN identical embeddings all land in
    // ONE k-means cell; the within-cell join must salt-split, and the
    // stitch clique must keep the blob one component for keep-one
    val blob = (0 until hotN).map(i =>
      (4000L + i, Array(0.8f, -0.4f, 0.2f, 0.1f)))
    val spread = (0 until 40).map(i =>
      (1L + i, Array(i * 0.1f - 2f, 1f, i * 0.05f, -0.3f)))
    val df = (blob ++ spread).toDF("vec_id", "embedding")
    val guarded = Similarity.semDedupPairs(df, "embedding", "vec_id",
      tau = 0.99, nlist = 4, bucketCap = cap)
    val n = guarded.count()
    assert(n > 0)
    // splits = ceil(300/20) = 15; bounded like the banded miners
    assert(n <= 4 * 15 * (cap * (cap - 1) / 2),
      s"semantic pair count $n not bounded — cell guard inactive?")
    assert(guarded.count() ===
      guarded.dropDuplicates("id_a", "id_b").count(),
      "stitch clique produced duplicate pairs")
    val labels = Dedup.connectedComponents(
      guarded.select("id_a", "id_b"), "id_a", "id_b")
    assert(labels.filter(col("id") >= 4000L)
      .select("component").distinct().count() === 1L,
      "salt split disconnected the semantic blob")
    // sane corpus at the default cap: identical pair set, no salt applied
    val open = Similarity.semDedupPairs(df, "embedding", "vec_id",
      tau = 0.99, nlist = 4)
    assert(pairSet(guarded).subsetOf(pairSet(open)))
  }

  test("guard the guard: pathologically-many hot buckets degrade to the join path, same output") {
    // an adversarial corpus can make EVERY bucket hot — one collected row
    // per hot bucket would then be an unbounded driver collect. Past
    // maxHotCollect the probe joins the un-collected hot aggregate; the
    // salted output (including stitch rows) must be identical either way.
    val banded = (0 until 40).flatMap(b =>
      (0 until cap + 5).map(i => (b.toLong * 1000 + i, b.toLong)))
      .toDF("_id", "_bucket")
    def run(maxHot: Int) = {
      val (salted, hot) = Dedup.withBucketSaltProbed(
        banded, col("_bucket"), col("_id"), cap, maxHotCollect = maxHot)
      assert(hot, "40 over-cap buckets must probe hot")
      salted.collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    }
    val viaBroadcast = run(100000) // all 40 hot rows collected + broadcast
    val viaJoin = run(10)          // 40 > 10: un-collected fallback join
    assert(viaJoin === viaBroadcast,
      "join-fallback salt diverged from the broadcast salt")
    // cross-corpus flavor: same degradation, same salts
    def runCross(maxHot: Int) = {
      val (l, r) = Dedup.withCrossBucketSalt(banded, banded,
        col("_bucket"), col("_id"), col("_id"), cap, maxHotCollect = maxHot)
      (l.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet,
        r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet)
    }
    assert(runCross(10) === runCross(100000))
  }

  test("embedding: hot LSH bucket bounded without losing the cluster") {
    // identical vectors land in one hyperplane bucket per table
    val vecs = (0 until hotN).map(i => (3000L + i, Array(1.0f, 0.5f, -0.25f, 0.125f))) :+
      (1L, Array(-1.0f, 0.5f, 0.25f, -0.125f))
    val df = vecs.toDF("vec_id", "embedding")
    val guarded = Dedup.embeddingNearDup(df, "embedding", "vec_id",
      planes = 4, threshold = 0.99, bucketCap = cap)
    val n = guarded.count()
    assert(n > 0)
    assert(n <= 4 * 15 * (cap * (cap - 1) / 2))
    val labels = Dedup.connectedComponents(
      guarded.select("id_a", "id_b"), "id_a", "id_b")
    assert(labels.filter(col("id") >= 3000L)
      .select("component").distinct().count() === 1L)
  }
}
