package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the incremental-refresh primitives: upsert's three-way semantics
  * (update wins / insert appears / base persists), null-safe key
  * matching, schema-mismatch rejection, and the partial-aggregate merge
  * law (merged partials ≡ full recompute). */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  test("upsert: update wins, insert appears, base persists, null keys match") {
    val base = Seq((Some(1L), "a", 10), (Some(2L), "b", 20),
      (None: Option[Long], "n", 30)).toDF("k", "name", "v")
    val updates = Seq((Some(2L), "B", 21), (Some(9L), "ins", 99),
      (None: Option[Long], "N", 31)).toDF("k", "name", "v")
    val out = Merge.upsert(base, updates, Seq("k"))
      .collect().map(r => (Option(r.get(0)), r.getString(1), r.getInt(2)))
      .toSet
    assert(out === Set(
      (Some(1L), "a", 10),   // base persists
      (Some(2L), "B", 21),   // update wins
      (Some(9L), "ins", 99), // insert appears
      (None, "N", 31)))      // null key matches null key, not duplicated
  }

  test("upsert: a matched update carrying NULL in a non-key column wins with that NULL") {
    // MERGE semantics: matched rows take the update's value in EVERY
    // column — a per-column coalesce would silently keep the base's old
    // value whenever the update legitimately nulls a field
    val base = Seq((1L, Some("old"), Some(10)), (2L, Some("keep"), Some(20)))
      .toDF("k", "name", "v")
    val updates = Seq((1L, None: Option[String], None: Option[Int]))
      .toDF("k", "name", "v")
    val out = Merge.upsert(base, updates, Seq("k"))
      .collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out === Set(
      (1L, None, None),              // update's NULLs win
      (2L, Some("keep"), Some(20)))) // untouched base row intact
  }

  test("upsert survives a user column literally named \"_m\" (marker collision)") {
    // the internal presence marker must pick a fresh name, not overwrite
    // the data column — otherwise every update row's "_m" becomes true
    val base = Seq((1L, "keep"), (2L, "old")).toDF("k", "_m")
    val updates = Seq((2L, "new")).toDF("k", "_m")
    val out = Merge.upsert(base, updates, Seq("k"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out === Set((1L, "keep"), (2L, "new")))
  }

  test("upsert rejects mismatched schemas") {
    val base = Seq((1L, "a")).toDF("k", "name")
    val bad = Seq((1L, 2.0)).toDF("k", "other")
    intercept[IllegalArgumentException] {
      Merge.upsert(base, bad, Seq("k"))
    }
  }

  test("upsert edge cases: empty updates = identity, empty base = inserts") {
    val base = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val none = base.filter(lit(false))
    assert(Merge.upsert(base, none, Seq("k")).collect().toSet ===
      base.collect().toSet)
    assert(Merge.upsert(none, base, Seq("k")).collect().toSet ===
      base.collect().toSet)
  }

  test("upsertLatest: stale update loses, fresh wins, ties resolve by the full-row total order") {
    val base = Seq((1L, 10L, "v10"), (2L, 20L, "v20")).toDF("k", "seq", "v")
    val ups = Seq(
      (1L, 5L, "stale"),   // older than base: must LOSE
      (2L, 30L, "fresh"),  // newer: must WIN
      (3L, 1L, "insert")   // unmatched: appears
    ).toDF("k", "seq", "v")
    val out = Merge.upsertLatest(base, ups, Seq("k"), Seq("seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    assert(out === Set((1L, 10L, "v10"), (2L, 30L, "fresh"),
      (3L, 1L, "insert")))
    // equal seq: the remaining columns break the tie deterministically
    val tie = Merge.upsertLatest(base,
      Seq((1L, 10L, "zzz")).toDF("k", "seq", "v"), Seq("k"), Seq("seq"))
      .filter(col("k") === 1L).collect().head.getString(2)
    assert(tie === "zzz", "full-row total order must break seq ties")
    // an order column inside the key is a caller error
    intercept[IllegalArgumentException] {
      Merge.upsertLatest(base, ups, Seq("k", "seq"), Seq("seq"))
    }
  }

  test("upsertLatest: associative + commutative — any batching, any order, same settled state") {
    // the CDC law the streaming apply sink rests on: folding the batches
    // one at a time, in ANY permutation, equals the global resolution
    val rows = (0 until 60).map { i =>
      (i % 7L, (i * 13 % 31).toLong, s"p$i")
    }
    val global = Merge.upsertLatest(
      rows.take(1).toDF("k", "seq", "v"),
      rows.drop(1).toDF("k", "seq", "v"), Seq("k"), Seq("seq"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
      .toSet
    val batches = rows.grouped(13).toSeq
    for (perm <- Seq(batches, batches.reverse, batches.sortBy(_.head._2))) {
      val settled = perm.map(_.toDF("k", "seq", "v"))
        .reduce((acc, b) => Merge.upsertLatest(acc, b, Seq("k"), Seq("seq")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
        .toSet
      assert(settled === global,
        "batch-at-a-time application diverged from the global resolution")
    }
  }

  test("mergeAggregates: single partial is the identity") {
    val one = Seq(("A", 3L), ("B", 5L)).toDF("g", "n")
    val out = Merge.mergeAggregates(Seq(one), Seq("g"), sums = Seq("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(out === Set(("A", 3L), ("B", 5L)))
  }

  test("mergeAggregates: merged partials equal the full recompute") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    def part(f: org.apache.spark.sql.Column) = li.filter(f)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(30,8)")).as("qty"),
        min("l_suppkey").as("mn"), max("l_suppkey").as("mx"))
    // three-way split exercises >2-partial merging
    val merged = Merge.mergeAggregates(
        Seq(part(col("l_orderkey") % 3 === 0),
          part(col("l_orderkey") % 3 === 1),
          part(col("l_orderkey") % 3 === 2)),
        Seq("l_returnflag"), sums = Seq("n", "qty"),
        mins = Seq("mn"), maxs = Seq("mx"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2), r.getLong(3), r.getLong(4))).toSet
    val full = part(lit(true))
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2), r.getLong(3), r.getLong(4))).toSet
    assert(merged === full)
  }
}
