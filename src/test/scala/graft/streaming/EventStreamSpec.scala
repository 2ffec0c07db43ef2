package graft.streaming

import graft.SparkSpec

class EventStreamSpec extends SparkSpec {
  import spark.implicits._

  test("sessionize splits on gaps > threshold, aggregates within") {
    val us = 1000000L
    val evs = Seq(
      EventStream.Ev(1L, 0 * us, "a", 1.0),
      EventStream.Ev(1L, 60 * us, "b", 2.0),       // same session (1 min gap)
      EventStream.Ev(1L, 4000 * us, "c", 3.0),     // > 30 min later → new
      EventStream.Ev(2L, 0 * us, "d", 5.0)
    ).toDS()
    val out = EventStream.sessionize(evs, gapMinutes = 30)
      .collect().sortBy(s => (s.user_id, s.session_start_us))
    assert(out.length === 3)
    assert(out(0).n_events === 2 && out(0).total_value === 3.0)
    assert(out(0).session_start_us === 0L && out(0).session_end_us === 60 * us)
    assert(out(1).n_events === 1 && out(1).session_start_us === 4000 * us)
    assert(out(2).user_id === 2L)
  }

  test("sessionizeSorted equals the flatMapGroupsWithState form") {
    val us = 1000000L
    // spans sessions, users, ties and partition boundaries
    val evs = (for (u <- 1L to 7L; i <- 0 until 40) yield
      EventStream.Ev(u, (i * 67 + (if (i % 9 == 0) 4000 else 0)) * us,
        s"t${i % 3}", (u * 100 + i) / 7.0)).toDS()
    def key(s: EventStream.SessionOut) =
      (s.user_id, s.session_start_us, s.session_end_us, s.n_events,
        math.round(s.total_value * 10000))
    val a = EventStream.sessionize(evs, 30).collect().map(key).sorted.toSeq
    val b = EventStream.sessionizeSorted(evs, 30).collect().map(key).sorted.toSeq
    assert(a.nonEmpty && a === b)
  }

  test("windowed streaming drains AvailableNow and is replay-stable") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toFile
    val src = new java.io.File(tmp, "events.parquet").getAbsolutePath
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.parquet(src)
    val cp1 = new java.io.File(tmp, "cp1").getAbsolutePath
    val r1 = EventStream.windowedCounts(spark, src, cp1)
      .collect().map(_.toSeq).sortBy(_.toString)
    val cp2 = new java.io.File(tmp, "cp2").getAbsolutePath
    val r2 = EventStream.windowedCounts(spark, src, cp2)
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(r1.nonEmpty)
    assert(r1.toSeq === r2.toSeq)
  }

  test("streaming HLL state settles to exactly the batch registers, incrementally") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cp = new java.io.File("target/qtmp_stream", "cp_hll_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(cp)
    val streamed = EventStream.streamingHllRegisters(spark,
        s"$sf/events.parquet", cp.getAbsolutePath, "event_type", "user_id", 64)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val batch = graft.operators.Sketches.hllRegisters(
        spark.read.parquet(s"$sf/events.parquet"),
        Seq("event_type"), col("user_id"), 64)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(streamed === batch)
    // the state really accumulated across micro-batches: one committed
    // offset per drained file (4-file scratch source), not one big batch
    val commits = new java.io.File(cp, "commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits >= 4, s"expected >=4 micro-batches, saw $commits commits")
  }

  test("streaming CMS state settles to exactly the batch cells, incrementally") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cp = new java.io.File("target/qtmp_stream", "cp_cms_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(cp)
    val streamed = EventStream.streamingCmsCells(spark,
        s"$sf/events.parquet", cp.getAbsolutePath, "user_id", 4, 256)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    val batch = graft.operators.Sketches.cmsCounts(
        spark.read.parquet(s"$sf/events.parquet").select("user_id"),
        "user_id", 4, 256)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSet
    assert(streamed === batch)
    val commits = new java.io.File(cp, "commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits >= 4, s"expected >=4 micro-batches, saw $commits commits")
  }

  test("session_window streaming equals the sorted-fold sessionize, incrementally") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val sf = "/root/testdata/sf0.001"
    val cp = new java.io.File("target/qtmp_stream", "cp_sesswin_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(cp)
    val streamed = EventStream.sessionWindowCounts(spark,
        s"$sf/events.parquet", cp.getAbsolutePath, gapMinutes = 30)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // the explicit-state sessionize; session_window's end = last ts + gap
    val evs = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("ts").as("ts_us"), col("event_type"),
        col("value"))
      .as[EventStream.Ev]
    val folded = EventStream.sessionizeSorted(evs, gapMinutes = 30)
      .collect()
      .map(s => (s.user_id, s.session_start_us,
        s.session_end_us + 30L * 60 * 1000000, s.n_events.toLong))
      .toSet
    assert(streamed === folded)
    val commits = new java.io.File(cp, "commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits >= 4, s"expected >=4 micro-batches, saw $commits commits")
  }

  test("streaming materialized view: latest == batch, every version time-travels") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cp = new java.io.File("target/qtmp_stream", "cp_mv_spec")
    val table = new java.io.File("target/qtmp_stream", "mvtable_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(cp); rm(table)
    val latest = EventStream.streamingMaterializedAgg(spark,
        s"$sf/events.parquet", cp.getAbsolutePath, table.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = graft.util.Tables.events(spark, sf)
    val batch = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max(col("ts")).as("last"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(latest === batch)
    // one committed version per micro-batch, all readable, monotone rows
    val vMax = graft.operators.Export
      .latestSnapshotVersion(table.getAbsolutePath)
    assert(vMax >= 4, s"expected >=4 versions, got $vMax")
    val counts = (1 to vMax).map(v => graft.operators.Export
      .readSnapshot(spark, table.getAbsolutePath, v)
      .agg(sum("n_events")).head().getLong(0))
    assert(counts.last === ev.count())
    assert(counts === counts.sorted, s"event totals not monotone: $counts")
  }

  test("materialized view killed between micro-batches resumes to the uninterrupted result") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cp = new java.io.File("target/qtmp_stream", "cp_mvr_spec")
    val table = new java.io.File("target/qtmp_stream", "mvrtable_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(cp); rm(table)
    // wipe a stale live dir from an earlier run (single naming source
    // of truth: EventStream.matviewLiveDir)
    rm(EventStream.matviewLiveDir(s"$sf/events.parquet", cp.getAbsolutePath))
    val latest = EventStream.streamingMaterializedAggResumed(spark,
        s"$sf/events.parquet", cp.getAbsolutePath, table.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ev = graft.util.Tables.events(spark, sf)
    val batch = ev.groupBy("user_id")
      .agg(count(lit(1)).as("n"), max(col("ts")).as("last"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(latest === batch, "resumed stream diverged from the one-shot batch result")
    val dir = table.getAbsolutePath
    val vMax = graft.operators.Export.latestSnapshotVersion(dir)
    assert(vMax >= 4, s"expected >=4 versions across the two runs, got $vMax")
    // intermediate versions (including run 1's, committed before the
    // kill) stay time-travel-readable with monotone totals
    val counts = (1 to vMax).map(v => graft.operators.Export
      .readSnapshot(spark, dir, v).agg(sum("n_events")).head().getLong(0))
    assert(counts.last === ev.count())
    assert(counts === counts.sorted, s"event totals not monotone: $counts")
    // batch ids continue across the restart (no reprocessing, no gaps
    // double-applied): strictly increasing across ALL committed versions
    val batchIds = (1 to vMax).map(v => graft.operators.Export
      .snapshotMeta(dir, v)("batch").toLong)
    assert(batchIds === batchIds.sorted.distinct,
      s"batch ids not strictly increasing across the kill: $batchIds")
  }

  test("matview sink skips replayed batch ids: rerun with a FRESH checkpoint merges nothing") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cp1 = new java.io.File("target/qtmp_stream", "cp_mvg1_spec")
    val cp2 = new java.io.File("target/qtmp_stream", "cp_mvg2_spec")
    val table = new java.io.File("target/qtmp_stream", "mvgtable_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(cp1); rm(cp2); rm(table)
    val first = EventStream.streamingMaterializedAgg(spark,
        s"$sf/events.parquet", cp1.getAbsolutePath, table.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val vAfterFirst = graft.operators.Export
      .latestSnapshotVersion(table.getAbsolutePath)
    // the worst replay storm: a FRESH checkpoint re-delivers EVERY batch
    // (ids restart at 0) against the already-committed table — the
    // #batch= guard must skip them all, or counts double
    val second = EventStream.streamingMaterializedAgg(spark,
        s"$sf/events.parquet", cp2.getAbsolutePath, table.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(second === first, "replayed batches were double-merged")
    assert(graft.operators.Export.latestSnapshotVersion(table.getAbsolutePath)
      === vAfterFirst, "replay committed new versions")
  }

  test("streaming lake ingest: settled snapshot == source rows, versioned per batch, replay-proof") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cp1 = new java.io.File("target/qtmp_stream", "cp_lake1_spec")
    val cp2 = new java.io.File("target/qtmp_stream", "cp_lake2_spec")
    val table = new java.io.File("target/qtmp_stream", "laketable_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(cp1); rm(cp2); rm(table)
    val settled = EventStream.streamingLakeIngest(spark,
      s"$sf/events.parquet", cp1.getAbsolutePath, table.getAbsolutePath)
    val src = graft.util.Tables.events(spark, sf)
      .select(col("user_id"), col("ts").as("ts_us"), col("event_type"),
        col("value"))
    assert(settled.count() === src.count())
    assert(settled.exceptAll(src).count() === 0)
    assert(src.exceptAll(settled).count() === 0)
    val dir = table.getAbsolutePath
    val vMax = graft.operators.Export.latestSnapshotVersion(dir)
    assert(vMax >= 4, s"expected one version per micro-batch, got $vMax")
    // append log: totals grow monotonically, early versions still readable
    val counts = (1 to vMax).map(v =>
      graft.operators.Export.readSnapshot(spark, dir, v).count())
    assert(counts === counts.sorted && counts.last === src.count())
    // replay storm (fresh checkpoint, same table): #batch= guard appends nothing
    EventStream.streamingLakeIngest(spark,
      s"$sf/events.parquet", cp2.getAbsolutePath, dir)
    assert(graft.operators.Export.latestSnapshotVersion(dir) === vMax,
      "replayed batches appended duplicate epochs")
  }

  test("CDC apply: settled state == global per-key resolution, merge commits versioned, replay-proof") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cp1 = new java.io.File("target/qtmp_stream", "cp_cdc1_spec")
    val cp2 = new java.io.File("target/qtmp_stream", "cp_cdc2_spec")
    val table = new java.io.File("target/qtmp_stream", "cdctable_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(cp1); rm(cp2); rm(table)
    val settled = EventStream.streamingCdcApply(spark,
      s"$sf/events.parquet", cp1.getAbsolutePath, table.getAbsolutePath)
    // global LWW resolution, computed in one pass over the source — the
    // incremental application across 4+ micro-batches must equal it
    val global = graft.util.Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), col("ts").as("ts_us"),
        col("value"))
      .groupBy("event_type", "user_id")
      .agg(max(struct(col("ts_us"), col("value"))).as("m"))
      .select(col("event_type"), col("user_id"),
        col("m.ts_us").as("ts_us"), col("m.value").as("value"))
    assert(settled.count() === global.count())
    assert(settled.exceptAll(global).count() === 0 &&
      global.exceptAll(settled).count() === 0)
    // one commit per micro-batch (bootstrap append + merges), and the
    // table stays key-unique at every version
    val dir = table.getAbsolutePath
    val vMax = graft.operators.Export.latestSnapshotVersion(dir)
    assert(vMax >= 4, s"expected one version per micro-batch, got $vMax")
    val head = graft.operators.Export.readSnapshot(spark, dir, vMax)
    assert(head.groupBy("event_type", "user_id").count()
      .filter(col("count") > 1).count() === 0, "merged table lost key-uniqueness")
    // replay storm (fresh checkpoint, same table): the #batch= header on
    // MERGE commits must block every re-delivered batch
    EventStream.streamingCdcApply(spark,
      s"$sf/events.parquet", cp2.getAbsolutePath, dir)
    assert(graft.operators.Export.latestSnapshotVersion(dir) === vMax,
      "replayed batches re-merged into the table")
  }

  test("watermark: late row dropped, tail windows withheld, emitted counts conserve") {
    val stage = new java.io.File("target/qtmp_stream", "wm_stage_spec")
    val cp = new java.io.File("target/qtmp_stream", "cp_wm_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(stage); rm(cp)
    val rows = EventStream.streamingWatermarkedCounts(spark,
        stage.getAbsolutePath, cp.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // final watermark = 7999 - 120 = 7879 min: emitted windows are
    // [0,60) .. [7800,7860) — 131 windows; [7860,7920)+ withheld
    assert(rows.length === 131)
    assert(rows.map(_._1).max === 7800L)
    // conservation: rows i=0..7859 minus the planted late row (i=6000,
    // restamped to minute 0, arriving in batch 4 with watermark at 5879)
    assert(rows.map(_._2).sum === 7859L,
      "late row not dropped or a window lost rows")
    // window [0,60) holds exactly i=0..59 — the planted row did NOT
    // sneak into the long-finalized first window
    assert(rows.find(_._1 == 0L).map(_._2) === Some(60L))
    val commits = new java.io.File(cp, "commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits >= 4, s"expected >=4 micro-batches, saw $commits")
  }

  test("stream-stream join: every in-window match found, late click discarded after state eviction") {
    val stage = new java.io.File("target/qtmp_stream", "ssj_stage_spec")
    val cp = new java.io.File("target/qtmp_stream", "cp_ssj_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(stage); rm(cp)
    val rows = EventStream.streamingStreamJoin(spark,
        stage.getAbsolutePath, cp.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every clicked ad (i % 3 == 0, i < 4000) matched exactly once with
    // its own impression and the minute-5 attribution delta
    assert(rows.length === 1334)
    assert(rows.forall { case (i, im, cm) => im === i && cm === i + 5 })
    assert(rows.map(_._1).distinct.length === 1334)
    // the planted late click (ad 10, minute 15, arriving two batches
    // after the watermark passed it) found no state and emitted nothing
    assert(!rows.exists(_._1 == 10L),
      "late click matched — join state was not evicted")
  }

  test("update mode emits only changed keys per batch; last update equals the batch aggregate") {
    val stage = new java.io.File("target/qtmp_stream", "upd_stage_spec")
    val cp = new java.io.File("target/qtmp_stream", "cp_upd_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(stage); rm(cp)
    val byUser = EventStream.streamingUpdateCounts(spark,
        stage.getAbsolutePath, cp.getAbsolutePath)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(byUser.size === 40)
    // users 0-19 appear in all 4 files -> 4 updates, 150*3/... = 250 rows;
    // users 20-39 appear only in the first 3 -> 3 updates, 150 rows
    (0L until 20L).foreach(u => assert(byUser(u) === ((4L, 250L)), s"user $u"))
    (20L until 40L).foreach(u => assert(byUser(u) === ((3L, 150L)), s"user $u"))
  }

  test("left-outer stream-stream join: null rows emit only past the eviction horizon, tail withheld") {
    val stage = new java.io.File("target/qtmp_stream", "ssjo_stage_spec")
    val cp = new java.io.File("target/qtmp_stream", "cp_ssjo_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(stage); rm(cp)
    val rows = EventStream.streamingStreamJoinOuter(spark,
        stage.getAbsolutePath, cp.getAbsolutePath)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2))))
    val matched = rows.filter(_._3.isDefined)
    val nulls = rows.filter(_._3.isEmpty)
    // every clicked ad matched exactly once, none null-emitted too
    assert(matched.length === 1334)
    assert(matched.forall { case (i, im, cm) => im === i && cm === Some(i + 5) })
    assert(!nulls.exists(n => matched.exists(_._1 == n._1)),
      "an ad emitted both matched and null-padded")
    // unmatched ads: emitted iff imp_ts + 30min < final watermark
    // (min(5439, 5444) - 60 = 5379 min) => i < 3909; the 60 newest
    // unclicked ads are withheld, not emitted partial
    val expectedNullIds = (0L until 4000L)
      .filter(i => i % 3 != 0 && i < 3909).toSet
    assert(nulls.map(_._1).toSet === expectedNullIds)
  }

  test("bounded-state dedup: in-horizon replays drop, expired-state replays re-emit") {
    val stage = new java.io.File("target/qtmp_stream", "dwb_stage_spec")
    val cp = new java.io.File("target/qtmp_stream", "cp_dwb_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(stage); rm(cp)
    val rows = EventStream.streamingDedupBounded(spark,
        stage.getAbsolutePath, cp.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byId = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    // exact in-batch duplicate of id 7: one emission
    assert(byId(7L) === Seq(7L))
    // replay of id 6005 while its state is still held: one emission
    assert(byId(6005L) === Seq(6005L))
    // replay of id 50 AFTER the watermark evicted its state: TWO
    // emissions — the documented trade of bounding dedup state
    assert(byId(50L) === Seq(50L, 6100L))
    assert(rows.length === 211)
  }

  test("timeout sessionization: successor closure, timeout closure, open sessions withheld") {
    val stage = new java.io.File("target/qtmp_stream", "sto_stage_spec")
    val cp = new java.io.File("target/qtmp_stream", "cp_sto_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(stage); rm(cp)
    val rows = EventStream.sessionizeTimeout(spark,
        stage.getAbsolutePath, cp.getAbsolutePath)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.length === 40)
    (0L until 20L).foreach { u =>
      val mine = rows.filter(_._1 == u).sortBy(_._2)
      // session 1 (always closed by session 2's arrival) and session 2
      assert(mine.map(s => (s._2, s._3, s._4)) ===
        Seq((u, u + 10, 3L), (u + 100, u + 105, 2L)), s"user $u")
    }
    // users 10-19 have NO third session: their session 2 can only have
    // emitted via the EVENT-TIME TIMEOUT — its presence proves the path
    assert((10L until 20L).forall(u =>
      rows.exists(r => r._1 == u && r._2 == u + 100)))
    // users 0-9's third session (still open at final watermark) is
    // withheld, not flushed partial
    assert(!rows.exists(_._2 >= 200L), "an open session was flushed")
  }

  test("exactly-once guard survives an interleaved compaction (batch header scanned back, not latest-only)") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cp1 = new java.io.File("target/qtmp_stream", "cp_mvc1_spec")
    val cp2 = new java.io.File("target/qtmp_stream", "cp_mvc2_spec")
    val table = new java.io.File("target/qtmp_stream", "mvctable_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(cp1); rm(cp2); rm(table)
    val first = EventStream.streamingMaterializedAgg(spark,
        s"$sf/events.parquet", cp1.getAbsolutePath, table.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // maintenance commit between stream runs: compaction's manifest
    // carries only compacted_from — a latest-version-only guard would
    // read applied = -1 and double-merge the replay storm below
    graft.operators.Export.compactSnapshot(spark, table.getAbsolutePath)
    val vAfterCompact = graft.operators.Export
      .latestSnapshotVersion(table.getAbsolutePath)
    val second = EventStream.streamingMaterializedAgg(spark,
        s"$sf/events.parquet", cp2.getAbsolutePath, table.getAbsolutePath)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(second === first,
      "replayed batches double-merged after an interleaved compaction")
    assert(graft.operators.Export.latestSnapshotVersion(table.getAbsolutePath)
      === vAfterCompact, "replay committed new versions past the compaction")
  }

  test("RocksDB state store: the production-grade provider yields identical streaming state") {
    // the default HDFSBackedStateStore holds keyed state in executor
    // heap — at 100 TB streaming state the deployment runs RocksDB.
    // Same drain, same registers, different provider (fresh checkpoint:
    // a checkpoint records its provider and cannot be mixed).
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cpH = new java.io.File("target/qtmp_stream", "cp_hll_rocks_base")
    val cpR = new java.io.File("target/qtmp_stream", "cp_hll_rocks")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete()
    }
    rm(cpH); rm(cpR)
    def regs(cp: java.io.File) = EventStream.streamingHllRegisters(spark,
        s"$sf/events.parquet", cp.getAbsolutePath, "event_type", "user_id", 64)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val viaDefault = regs(cpH)
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "org.apache.spark.sql.execution.streaming.state." +
      "RocksDBStateStoreProvider")
    try {
      val viaRocks = regs(cpR)
      assert(viaRocks === viaDefault,
        "RocksDB-backed state diverged from the default provider")
      assert(viaRocks.nonEmpty)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("streaming log2-histogram settles to exactly the batch bins, incrementally") {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val cp = new java.io.File("target/qtmp_stream", "cp_hist_spec")
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(rm); f.delete()
    }
    rm(cp)
    val streamed = EventStream.streamingLogHistogram(spark,
        s"$sf/events.parquet", cp.getAbsolutePath,
        "CAST(floor(value * 100) AS BIGINT)")
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    val batch = graft.operators.Sketches.logHistogram(
        spark.read.parquet(s"$sf/events.parquet")
          .selectExpr("CAST(floor(value * 100) AS BIGINT) AS v"),
        col("v"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(streamed === batch)
    val commits = new java.io.File(cp, "commits").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(commits >= 4, s"expected >=4 micro-batches, saw $commits commits")
  }
}
