package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** EXACT end-to-end banding semantics for the SimHash miner — the
  * deterministic sibling of MinhashRecallSpec (MinHash banding is
  * probabilistic in the hash draw; SimHash banding is not: a pair
  * collides iff some 16-bit band contains NO differing bit). Sketch-level
  * planting makes the whole contract checkable exactly:
  *
  *   detected(a, b)  ⇔  (∃ band of 16 consecutive bits with no flip)
  *                      ∧ hamming(a, b) ≤ maxHamming
  *
  * so this spec asserts the miner's planted-pair detection set EQUALS the
  * predicate — no floors, no margins — plus that the reported hamming is
  * the true bit distance. */
class SimhashRecallSpec extends SparkSpec {

  test("simhash banding detects exactly the untouched-band pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(1234)
    val maxHamming = 8
    // planted pairs: base sketch + partner with d flipped bits at random
    // positions, d spanning under/at/over maxHamming and flips that do or
    // don't wipe out every band
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val truth = scala.collection.mutable.ArrayBuffer[(Long, Long, Int, Boolean)]()
    var id = 0L
    (0 until 250).foreach { i =>
      val base = rnd.nextLong()
      val d = 1 + rnd.nextInt(12) // 1..12 flips
      val positions = rnd.shuffle((0 until 64).toList).take(d)
      val mask = positions.foldLeft(0L)((m, p) => m | (1L << p))
      val partner = base ^ mask
      val bandUntouched = (0 until 4).exists(b =>
        ((mask >>> (b * 16)) & 0xFFFFL) == 0L)
      rows += ((id, base)); rows += ((id + 1, partner))
      truth += ((id, id + 1, d, bandUntouched && d <= maxHamming))
      id += 2
    }
    val sketches = rows.toSeq.toDF("_id", "_h")
    val mined = Dedup.simhashPairsFromSketches(sketches, maxHamming)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    // background (cross-plant) collisions are possible in principle
    // (2^-16 per band) but must clear the hamming filter — random 64-bit
    // sketches sit at hamming ~32, so any mined pair here is planted
    mined.keys.foreach { case (a, b) =>
      assert(b == a + 1 && a % 2 == 0,
        s"unplanted pair mined: ($a, $b) — random sketches at hamming<=8?")
    }
    truth.foreach { case (a, b, d, expectDetected) =>
      val got = mined.get((a, b))
      assert(got.isDefined === expectDetected,
        s"pair ($a,$b) d=$d: detected=${got.isDefined}, expected $expectDetected")
      got.foreach(h => assert(h === d, s"pair ($a,$b): hamming $h != true $d"))
    }
    // the plant exercises both branches of each conjunct
    assert(truth.exists { case (_, _, d, det) => det && d == maxHamming })
    assert(truth.exists { case (_, _, d, _) => d > maxHamming })
    assert(truth.exists { case (_, _, d, det) => !det && d <= maxHamming })
    assert(truth.count(_._4) > 50, "degenerate plant: almost nothing detectable")
  }
}
