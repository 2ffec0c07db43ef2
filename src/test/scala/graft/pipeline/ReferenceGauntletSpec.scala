package graft.pipeline

import java.io.File
import graft.SparkSpec
import graft.sources.TableFilter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's own integration fixtures, imported end-to-end, checked
  * against the exact numbers its run.sh scripts assert (pre-rebase state —
  * the parquet sink analog of "SELECT ... after lightning finishes").
  * Read-only from the reference checkout; skipped when absent. */
class ReferenceGauntletSpec extends SparkSpec {

  private val refTests = new File("/root/reference/tests")

  private def imported(scenario: String, db: String): String = {
    val out = new File(s"target/test_refgauntlet/$scenario").getAbsolutePath
    val cfg = ImportConfig(
      sourceDir = new File(refTests, s"$scenario/data").getAbsolutePath,
      outDir = out,
      filter = TableFilter(doTables = Seq((db, "*"))),
      checkpointEnabled = false)
    new ImportPipeline(spark, cfg).run()
    out
  }

  private def tbl(out: String, db: String, table: String): DataFrame =
    spark.read.parquet(s"$out/$db/$table")

  test("tool_135: five auto-increment tables match the reference sums") {
    assume(refTests.isDirectory)
    val out = imported("tool_135", "tool_135")
    // (table, col -> (count, sum, min, max)) straight from run.sh
    val expect = Seq(
      ("bar1", "a", (1000L, 601500L, 102L, 1101L)),
      ("bar2", "a", (1000L, 548500L, 49L, 1048L)),
      ("bar3", "a", (1000L, 532218793L, 1071L, 1048054L)),
      ("bar3", "b", (1000L, 645500L, 146L, 1145L)),
      ("bar4", "a", (1000L, 588500L, 89L, 1088L)),
      ("bar5", "a", (1000L, 534846115L, 970L, 1045357L)),
      ("bar5", "b", (1000L, 563500L, 64L, 1063L)))
    for ((t, c, (n, s, mn, mx)) <- expect) {
      val r = tbl(out, "tool_135", t).agg(
        count(col(c)), sum(col(c)).cast("long"),
        min(col(c)).cast("long"), max(col(c)).cast("long")).collect()(0)
      assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
        ((n, s, mn, mx)), s"$t.$c")
    }
  }

  test("tool_1420: reserved-ish table name pt_role imports its one row") {
    assume(refTests.isDirectory)
    val out = imported("tool_1420", "EE1420")
    val rows = tbl(out, "EE1420", "pt_role").collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("1"))
  }

  test("tool_241: zero-byte data file -> empty table; unsigned ints + zero-date defaults parse") {
    assume(refTests.isDirectory)
    val out = imported("tool_241", "qyjc")
    val fish = tbl(out, "qyjc", "q_fish_event")
    val r = fish.agg(count(col("id")), min(col("id")).cast("long"),
      max(col("id")).cast("long")).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) ===
      ((84L, 8343146L, 8343229L)))
    // the reference creates q_alarm_group from a 0-byte shard: empty, not a crash
    assert(tbl(out, "qyjc", "q_alarm_group").count() === 0L)
  }

  test("tool_1472: multi-shard tiny tables; auto-inc column on a non-pk table") {
    assume(refTests.isDirectory)
    val out = imported("tool_1472", "EE1472")
    assert(tbl(out, "EE1472", "pk").select("a").collect()
      .map(_.getByte(0).toInt).sorted.toSeq === Seq(3, 4))
    assert(tbl(out, "EE1472", "notpk").select("a", "b").collect()
      .map(r => (r.getInt(0), r.getByte(1).toInt)).sortBy(_._1).toSeq ===
      Seq((1111, 6), (2222, 9)))
  }

  test("partitioned-table: PARTITION BY clause tolerated, data lands whole") {
    assume(refTests.isDirectory)
    val out = imported("partitioned-table", "partitioned")
    val r = tbl(out, "partitioned", "a")
      .agg(count(lit(1)), sum(col("a")).cast("long")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === ((7L, 277151781L)))
  }

  test("default-columns: empty tuples fill defaults; auto-inc synthesis on missing columns") {
    assume(refTests.isDirectory)
    val out = imported("default-columns", "defcol")
    val t = tbl(out, "defcol", "t")
    assert(t.count() === 9L)
    assert(t.agg(min(col("pk"))).collect()(0).getInt(0) === 1)
    assert(t.filter(col("x").isNotNull || col("y") =!= 123 ||
      col("z").isNull).count() === 0L, "x default NULL, y default 123, z default now()")
    val u = tbl(out, "defcol", "u").select("xx", "yy").collect()
      .map(r => (r.getInt(0), r.getInt(1))).sortBy(_._2)
    assert(u.toSeq === Seq((1, 40), (2, 60)))
  }

  test("row-format-v2: 150-column wide rows with null tails") {
    assume(refTests.isDirectory)
    val out = imported("row-format-v2", "rowformatv2")
    val t1 = tbl(out, "rowformatv2", "t1")
    assert(t1.count() === 50L)
    val col14 = t1.select("col14").distinct().collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSet
    assert(col14.contains(None) && col14.contains(Some(39)))
  }
}
