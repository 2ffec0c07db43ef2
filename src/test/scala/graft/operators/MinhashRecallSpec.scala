package graft.operators

import graft.SparkSpec

/** End-to-end near-dup RECALL floor for the MinHash+LSH miner — the
  * banding-theory twin of IvfPqRecallSpec. The `_verify`/`_md5` gates pin
  * that the miner's flags match a cross-engine replay of the SAME kernel;
  * nothing there pins that the kernel finds what it is SUPPOSED to find.
  * This spec plants near-duplicate pairs at controlled char-5-gram Jaccard
  * levels into a synthetic corpus, computes each pair's TRUE Jaccard, and
  * asserts the miner's detection rate clears the banding formula's
  * expectation: with b bands of r rows, a pair at similarity s collides in
  * ≥1 band with probability p(s) = 1 − (1 − s^r)^b (Leskovec/Rajaraman/
  * Ullman, "Mining of Massive Datasets" §3.4). The corpus is seeded, so
  * the assertion is deterministic; the margins absorb the formula's
  * independent-hash idealization (xxhash64 lanes are pairwise-independent
  * in practice, not in proof).
  */
class MinhashRecallSpec extends SparkSpec {

  private val NumHashes = 32
  private val Bands = 8
  private val RowsPerBand = NumHashes / Bands

  /** p(detect) under the banding model. */
  private def bandProb(s: Double): Double =
    1.0 - math.pow(1.0 - math.pow(s, RowsPerBand), Bands)

  /** Char-5-gram multiset→set Jaccard, the same shingle definition as
    * SketchOps.minhashSigs: sliding 5-char windows over the normalized
    * text (whole string when shorter), duplicates collapsed (Jaccard is
    * over shingle SETS; min() is multiset-invariant on the kernel side). */
  private def trueJaccard(a: String, b: String): Double = {
    def sh(t: String): Set[String] =
      if (t.length <= 5) Set(t)
      else (0 to t.length - 5).map(i => t.substring(i, i + 5)).toSet
    val (sa, sb) = (sh(a), sh(b))
    sa.intersect(sb).size.toDouble / sa.union(sb).size
  }

  test("LSH banding recall clears the formula floor at planted Jaccard levels") {
    val rnd = new scala.util.Random(42)
    def word(): String = {
      val n = 3 + rnd.nextInt(6)
      (0 until n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    }
    val vocab = Vector.fill(500)(word())
    def doc(): Vector[String] = Vector.fill(30)(vocab(rnd.nextInt(vocab.size)))

    // 60 planted pairs per mutation level: replace `m` of 30 words with
    // fresh gibberish → controlled shingle churn → controlled Jaccard
    val levels = Seq(1, 3, 6)
    var nextId = 0L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    val planted = scala.collection.mutable.ArrayBuffer[(Long, Long, Int)]()
    // background corpus: unrelated docs (no planted twin)
    (0 until 100).foreach { _ =>
      rows += ((nextId, doc().mkString(" "))); nextId += 1
    }
    levels.foreach { m =>
      (0 until 60).foreach { _ =>
        val base = doc()
        val posns = rnd.shuffle(base.indices.toList).take(m)
        val mut = posns.foldLeft(base)((d, p) => d.updated(p, word()))
        val (ia, ib) = (nextId, nextId + 1)
        rows += ((ia, base.mkString(" "))); rows += ((ib, mut.mkString(" ")))
        nextId += 2
        planted += ((ia, ib, m))
      }
    }
    val byId = rows.toMap
    val truth = planted.map { case (a, b, m) =>
      ((a, b), (trueJaccard(byId(a), byId(b)), m))
    }.toMap

    import spark.implicits._
    val df = rows.toSeq.toDF("id", "text")
    // threshold 0 isolates BANDING recall from the estimator filter: a
    // pair is "detected" iff some band collides
    val mined = Dedup.minhashPairs(df, "text", "id",
        k = 5, numHashes = NumHashes, bands = Bands, threshold = 0.0)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    // overall floor: E[detections] − 3σ over the planted pairs' true s
    val probs = truth.values.map { case (s, _) => bandProb(s) }
    val expected = probs.sum
    val sigma = math.sqrt(probs.map(p => p * (1 - p)).sum)
    val detected = truth.keys.count(mined.contains)
    assert(detected >= expected - 3 * sigma,
      f"banding recall below formula floor: $detected detected, " +
        f"expected $expected%.1f (sigma $sigma%.2f)")

    // per-level floors: expectation from TRUE per-pair similarity, wide
    // deterministic margin (0.15) for the fixed-hash idealization
    levels.foreach { m =>
      val lv = truth.filter(_._2._2 == m)
      val exp = lv.values.map { case (s, _) => bandProb(s) }.sum / lv.size
      val rec = lv.keys.count(mined.contains).toDouble / lv.size
      assert(rec >= exp - 0.15,
        f"level m=$m: recall $rec%.2f < expected $exp%.2f - 0.15")
    }

    // sanity on the plant: the levels actually spread the similarity axis
    val meanS = levels.map { m =>
      val lv = truth.values.filter(_._2 == m).map(_._1)
      lv.sum / lv.size
    }
    assert(meanS(0) > 0.85 && meanS(1) > 0.65 && meanS(1) < meanS(0) &&
      meanS(2) > 0.45 && meanS(2) < meanS(1),
      s"planted similarity levels collapsed: $meanS")

    // estimator accuracy on detected planted pairs: the signature-agreement
    // estimate tracks true Jaccard (E[est] = s; 32 lanes → sd ≈ 0.09)
    val errs = truth.keys.toSeq.filter(mined.contains)
      .map(k => math.abs(mined(k) - truth(k)._1))
    assert(errs.sum / errs.size <= 0.1,
      f"estimator drifted: mean |est-true| = ${errs.sum / errs.size}%.3f")
  }
}
