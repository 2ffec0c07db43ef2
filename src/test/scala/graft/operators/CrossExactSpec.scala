package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins Bloom-pruned exact cross-corpus dedup: the Bloom filter is an
  * accelerator, never a semantics change — output must EQUAL the plain
  * md5 semi-join at any fpp — and the membership expression never drops
  * an inserted key (no false negatives, the property that makes the
  * two-phase design exact). */
class CrossExactSpec extends SparkSpec {
  import spark.implicits._

  test("flags equal the plain semi-join at tight and sloppy fpp") {
    val base = Seq(
      (0L, "shared content one"), (3L, "shared content two"),
      (6L, "base only text"), (9L, "Shared   CONTENT one!"))
      .toDF("doc_id", "text")
    val fresh = Seq(
      (1L, "shared content one"),          // exact dup
      (2L, "shared content two"),          // exact dup
      (4L, "SHARED content ONE"),          // dup after normalization
      (5L, "completely novel document"),   // not a dup
      (7L, "shared content"),              // prefix, not equal
      (8L, null.asInstanceOf[String]))     // dropped
      .toDF("doc_id", "text")
    val expected = Map(1L -> 1, 2L -> 1, 4L -> 1, 5L -> 0, 7L -> 0)
    // sloppy fpp floods the bloom with false positives; the verify join
    // must still produce exactly the semi-join answer
    for (fpp <- Seq(0.03, 0.5)) {
      val got = Dedup.crossExactFlags(fresh, base, "text", "doc_id",
          expectedBase = 10L, fpp = fpp)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got === expected, s"fpp=$fpp")
    }
  }

  test("bloom_might_contain from SQL: foldable unhex binary drives the probe") {
    graft.GraftExtensions.register(spark)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(10, 0.01)
    Seq(11L, 22L, 33L).foreach(bf.putLong)
    val hexed = graft.functions.BloomOps.serialize(bf)
      .map(b => f"$b%02x").mkString
    val got = spark.sql(
      s"""SELECT k, bloom_might_contain(k, unhex('$hexed')) AS hit
         |FROM VALUES (11L), (22L), (33L) AS t(k)""".stripMargin)
      .collect().map(r => r.getBoolean(1))
    assert(got.forall(identity))
  }

  test("bloom probe has no false negatives; pruning is real") {
    val keys = (0 until 2000).map(i => i.toLong * 7919L)
    val bf = org.apache.spark.util.sketch.BloomFilter.create(2000, 0.01)
    keys.foreach(bf.putLong)
    val bytes = graft.functions.BloomOps.serialize(bf)
    val inserted = keys.toDF("k")
      .filter(graft.functions.BloomOps.mightContain(col("k"), bytes))
      .count()
    assert(inserted === 2000L, "bloom dropped an inserted key")
    // disjoint probe set: the filter must actually prune (~fpp passes)
    val disjoint = (0 until 2000).map(i => i.toLong * 7919L + 1L)
    val passed = disjoint.toDF("k")
      .filter(graft.functions.BloomOps.mightContain(col("k"), bytes))
      .count()
    assert(passed < 200L, s"bloom not pruning: $passed/2000 passed")
  }
}
