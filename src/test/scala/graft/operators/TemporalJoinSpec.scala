package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalJoinSpec extends SparkSpec {

  test("asofJoin: latest at-or-before match, inclusive, per key") {
    import spark.implicits._
    val left = Seq((1L, 100L, "a"), (1L, 205L, "b"), (2L, 50L, "c"))
      .toDF("k", "t", "tag")
    val right = Seq((1L, 100L, 10L), (1L, 200L, 11L), (1L, 300L, 12L),
      (2L, 60L, 20L)).toDF("k", "rt", "rid")
    val out = TemporalJoin.asofJoin(left, right, "k", "t", "rt", "rid")
      .select("tag", "asof_rid").collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out("a") === Some(10L)) // equal time is inclusive
    assert(out("b") === Some(11L)) // latest ≤ 205 is 200
    assert(out("c") === None)      // key 2's only right row is later
  }

  test("asofJoin: equal-time ties break to the largest tie column") {
    import spark.implicits._
    val left = Seq((1L, 100L)).toDF("k", "t")
    val right = Seq((1L, 100L, 7L), (1L, 100L, 9L), (1L, 100L, 8L))
      .toDF("k", "rt", "rid")
    val got = TemporalJoin.asofJoin(left, right, "k", "t", "rt", "rid")
      .select("asof_rid").collect()(0).getLong(0)
    assert(got === 9L)
  }

  test("asofJoin: tolerance nulls out stale matches") {
    import spark.implicits._
    val left = Seq((1L, 1000L), (1L, 2000L)).toDF("k", "t")
    val right = Seq((1L, 900L, 1L)).toDF("k", "rt", "rid")
    val out = TemporalJoin.asofJoin(left, right, "k", "t", "rt", "rid",
        toleranceUs = Some(500L))
      .select("t", "asof_rid").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(out(1000L) === Some(1L)) // 100 µs back: inside tolerance
    assert(out(2000L) === None)     // 1100 µs back: stale
  }

  test("asofJoin: extra payload columns ride along") {
    import spark.implicits._
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq((1L, 5L, 1L, "hello")).toDF("k", "rt", "rid", "msg")
    val row = TemporalJoin.asofJoin(left, right, "k", "t", "rt", "rid",
      payloadCols = Seq("msg")).select("asof_msg", "asof_rt").collect()(0)
    assert(row.getString(0) === "hello" && row.getLong(1) === 5L)
  }

  test("rangeJoin: containment across bucket boundaries, no duplicates") {
    import spark.implicits._
    val points = Seq((1L, 50L, "p1"), (1L, 150L, "p2"), (1L, 999L, "p3"),
      (2L, 50L, "p4")).toDF("k", "p", "pid")
    // [40, 160] spans two 100-wide buckets; [140, 130] is degenerate
    val ivs = Seq((1L, 40L, 160L, "i1"), (1L, 140L, 130L, "ibad"),
      (2L, 200L, 300L, "i2")).toDF("k", "s", "e", "iid")
    val got = TemporalJoin.rangeJoin(points, ivs, "k", "p", "s", "e",
        bucketUs = 100L)
      .select("pid", "iid").collect().map(r => (r.getString(0), r.getString(1)))
      .sorted.toSeq
    // p1 and p2 both inside i1 (p2 via the second bucket), exactly once
    // each; p3 outside; p4's key-2 interval doesn't cover 50
    assert(got === Seq(("p1", "i1"), ("p2", "i1")))
  }

  test("rangeJoin equals a brute-force between-join") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val points = (1 to 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(10000).toLong, i.toLong))
      .toDF("k", "p", "pid")
    val ivs = (1 to 100).map { i =>
      val s = rnd.nextInt(10000).toLong
      (rnd.nextInt(5).toLong, s, s + rnd.nextInt(800).toLong, i.toLong)
    }.toDF("k", "s", "e", "iid")
    val banded = TemporalJoin.rangeJoin(points, ivs, "k", "p", "s", "e",
        bucketUs = 512L)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    val brute = points.as("p").join(ivs.as("i"),
        col("p.k") === col("i.k") && col("p.p") >= col("i.s") &&
          col("p.p") <= col("i.e"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    assert(banded === brute && brute.nonEmpty)
  }
}
