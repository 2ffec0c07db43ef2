package graft.operators

import graft.SparkSpec

/** Recall floor for the hyperplane-LSH embedding near-dup miner — the
  * third member of the recall-floor family (MinhashRecallSpec,
  * SimhashRecallSpec). Plants vector pairs at EXACT angles θ and checks
  * detection against random-hyperplane theory (Charikar 2002): a plane
  * separates a θ-pair with probability θ/π, so one `planes`-bit bucket
  * agrees with probability (1−θ/π)^planes and `tables` OR-amplified
  * families detect with
  *
  *   p(θ) = 1 − (1 − (1−θ/π)^planes)^tables.
  *
  * The corpus is seeded (fixed plane seeds, fixed vectors) so the
  * assertion is deterministic; margins absorb the pseudo-random planes'
  * deviation from the ideal uniform draw. */
class EmbedRecallSpec extends SparkSpec {

  private val Planes = 8
  private val Tables = 2

  private def formula(theta: Double): Double = {
    val pBucket = math.pow(1.0 - theta / math.Pi, Planes)
    1.0 - math.pow(1.0 - pBucket, Tables)
  }

  test("hyperplane-LSH recall clears the OR-amplification formula floor") {
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val dim = 16
    def gauss(): Array[Double] = Array.fill(dim)(rnd.nextGaussian())
    def normalize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    // partner at exact angle theta: rotate inside the (v, u⊥) plane
    def rotate(v: Array[Double], theta: Double): Array[Double] = {
      val u0 = gauss()
      val d = v.zip(u0).map { case (a, b) => a * b }.sum
      val u = normalize(u0.zip(v).map { case (b, a) => b - d * a })
      v.zip(u).map { case (a, b) =>
        math.cos(theta) * a + math.sin(theta) * b }
    }
    val thetas = Seq(0.10, 0.15, 0.25).map(_ * math.Pi)
    var id = 0L
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Float])]()
    val planted = scala.collection.mutable.ArrayBuffer[(Long, Long, Double)]()
    (0 until 60).foreach { _ =>
      rows += ((id, gauss().map(_.toFloat))); id += 1 // background
    }
    thetas.foreach { th =>
      (0 until 80).foreach { _ =>
        val v = normalize(gauss())
        val w = rotate(v, th)
        rows += ((id, v.map(_.toFloat))); rows += ((id + 1, w.map(_.toFloat)))
        planted += ((id, id + 1, th))
        id += 2
      }
    }
    val df = rows.toSeq.toDF("vec_id", "embedding")
    val mined = Dedup.embeddingNearDup(df, "embedding", "vec_id",
        planes = Planes, threshold = 0.65, tables = Tables)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap

    // per-level floor: formula expectation minus a deterministic margin
    thetas.foreach { th =>
      val lv = planted.filter(_._3 == th)
      val rec = lv.count { case (a, b, _) => mined.contains((a, b)) }
        .toDouble / lv.size
      val exp = formula(th)
      assert(rec >= exp - 0.15,
        f"theta=${th / math.Pi}%.2fπ: recall $rec%.2f < ${exp}%.2f - 0.15")
    }
    // overall 3σ floor over the heterogeneous plant
    val probs = planted.map { case (_, _, th) => formula(th) }
    val expected = probs.sum
    val sigma = math.sqrt(probs.map(p => p * (1 - p)).sum)
    val detected = planted.count { case (a, b, _) => mined.contains((a, b)) }
    assert(detected >= expected - 3 * sigma,
      f"overall recall $detected below $expected%.1f - 3σ ($sigma%.2f)")
    // the reported cosine is the planted angle's cosine (float32 storage
    // + packed-double math: loose 1e-3 bound)
    planted.foreach { case (a, b, th) =>
      mined.get((a, b)).foreach { c =>
        assert(math.abs(c - math.cos(th)) < 1e-3,
          f"pair ($a,$b): cosine $c%.4f != cos(θ)=${math.cos(th)}%.4f")
      }
    }
  }
}
