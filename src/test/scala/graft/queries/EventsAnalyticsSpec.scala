package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the product-analytics SEMANTICS on hand-built adversarial event
  * sets — cases the fixture oracle can't isolate: strict step ordering,
  * the earliest-completion rule, window boundaries, and transition
  * tie-breaks. Built on a temp parquet dir through the same query
  * functions the gates run. */
class EventsAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private val Hour = 3600L * 1000000
  private val Day = 24 * Hour

  /** Write events (user, ts_us, type) as an events.parquet the gate
    * loaders accept. A raw BIGINT `ts` is the NANOS historical layout
    * (Tables.tsMicros divides it by 1000), so µs inputs are stored ×1000. */
  private def eventsDir(rows: Seq[(Long, Long, String)]): String = {
    val d = new java.io.File(new java.io.File("target", "qtmp"),
      s"evspec_${rows.hashCode}")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(d)
    rows.zipWithIndex
      .map { case ((u, ts, ty), i) =>
        (i.toLong, ts * 1000, u, ty, 1.0, "{}")
      }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(new java.io.File(d, "events.parquet").getAbsolutePath)
    d.getAbsolutePath
  }

  private def funnelCounts(rows: Seq[(Long, Long, String)]): Map[Int, Long] =
    Events.q_funnel(spark, eventsDir(rows)).collect()
      .map(r => r.getInt(0) -> r.getLong(2)).toMap

  test("funnel: strict order — a click BEFORE the first view doesn't count") {
    val m = funnelCounts(Seq(
      (1L, 1 * Hour, "click"),   // too early: precedes the first view
      (1L, 2 * Hour, "view"),
      (2L, 1 * Hour, "view"),
      (2L, 2 * Hour, "click"),
      (2L, 3 * Hour, "purchase")))
    assert(m(1) === 2 && m(2) === 1 && m(3) === 1)
  }

  test("funnel: the 7-day window anchors at the FIRST view") {
    val m = funnelCounts(Seq(
      (1L, 0L, "view"),
      (1L, 8 * Day, "click"),      // outside [t1, t1+7d]
      (1L, 9 * Day, "purchase"),
      (2L, 0L, "view"),
      (2L, 6 * Day, "click"),      // inside
      (2L, 8 * Day, "purchase"))) // purchase outside the first-view window
    assert(m(1) === 2 && m(2) === 1 && m(3) === 0)
  }

  test("funnel: earliest completion — a later re-view can't re-open the window") {
    val m = funnelCounts(Seq(
      (1L, 0L, "view"),
      (1L, 10 * Day, "view"),      // later view; t1 stays at 0
      (1L, 11 * Day, "click"),     // > t1 + 7d
      (1L, 12 * Day, "purchase")))
    assert(m(1) === 1 && m(2) === 0 && m(3) === 0)
  }

  test("transitions: counted per user in ts order, no cross-user pairs") {
    val dir = eventsDir(Seq(
      (1L, 1 * Hour, "view"), (1L, 2 * Hour, "click"),
      (2L, 90L * 60 * 1000000, "error"))) // interleaved in global time
    val t = Events.q_transitions(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(t === Set(("view", "click", 1L))) // user 2's lone event pairs with nothing
  }

  test("retention: cohort = week of first event; offsets count active weeks") {
    val wk = 604800000000L
    val r = Events.q_retention(spark, eventsDir(Seq(
        (1L, 0L, "view"),            // cohort week 0
        (1L, wk + 1, "view"),        // active week 1 -> offset 1
        (1L, 3 * wk + 1, "view"),    // offset 3
        (2L, wk, "view"))))          // cohort week 1, offset 0
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(r === Set((0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L)))
  }
}
