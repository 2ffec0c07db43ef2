package graft.queries

import java.io.File
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.EventStream
import graft.util.Tables

/** Event-stream queries: real Structured Streaming (AvailableNow) windowed
  * aggregation, and stateful sessionization — both hash-matched against
  * batch-SQL oracles (tumbling windows are floor-division; sessions are
  * gaps-and-islands).
  */
object Events {

  /** Watermarked tumbling-window agg via readStream → writeStream(memory).
    * The checkpoint dir is wiped per run so replays are deterministic. */
  def q_stream_window(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    EventStream.windowedCounts(s, s"$dir/events.parquet",
      cp.getAbsolutePath, windowMinutes = 60)
  }

  val q_stream_window_sql: String =
    """SELECT CAST(floor(epoch_us(ts) / 3600000000) * 3600000000 AS BIGINT)
      |   AS window_start_us,
      | event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Streaming dedup: planted duplicate events collapse via watermarked
    * dropDuplicates; the aggregate of the deduped stream equals the batch
    * aggregate of the raw table. */
  def q_stream_dedup(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream", s"cp_dedup_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    EventStream.dedupedCounts(s, s"$dir/events.parquet", cp.getAbsolutePath)
      .orderBy("event_type")
  }

  val q_stream_dedup_sql: String =
    """SELECT event_type, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1""".stripMargin

  /** Gap-based sessionization via the sorted-iterator fold (O(1) state per
    * partition — no per-user history materialization). */
  def q_sessionize(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val evs = Tables.events(s, dir)
      .select(col("user_id"), col("ts").as("ts_us"), col("event_type"),
        col("value"))
      .as[EventStream.Ev]
    EventStream.sessionizeSorted(evs, gapMinutes = 30)
      .toDF()
      .select(col("user_id"), col("session_start_us"), col("session_end_us"),
        col("n_events"),
        round(col("total_value"), 4).as("total_value"))
  }

  val q_sessionize_sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, value,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts) > 1800000000
      |         OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
      |           IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |s AS (
      |  SELECT *, SUM(new_session)
      |    OVER (PARTITION BY user_id ORDER BY ts_us
      |          ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM e)
      |SELECT user_id,
      |  MIN(ts_us) AS session_start_us,
      |  MAX(ts_us) AS session_end_us,
      |  CAST(COUNT(*) AS INT) AS n_events,
      |  round(CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE), 4)
      |    AS total_value
      |FROM s GROUP BY user_id, session_id""".stripMargin

  /** Native session-window streaming sessionization
    * ([[graft.streaming.EventStream.sessionWindowCounts]]): Spark's
    * built-in merging-interval session state, drained over multiple
    * micro-batches in Complete mode — certified against the same
    * gaps-and-islands batch SQL the sorted-fold sessionize uses (with
    * the session_window `>=` boundary; see the operator doc). */
  def q_stream_sessionwin(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_sesswin_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    EventStream.sessionWindowCounts(s, s"$dir/events.parquet",
        cp.getAbsolutePath, gapMinutes = 30)
      .orderBy("user_id", "session_start_us")
  }

  val q_stream_sessionwin_sql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us,
      |    CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
      |           OVER (PARTITION BY user_id ORDER BY ts) >= 1800000000
      |         OR lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts)
      |           IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events),
      |s AS (
      |  SELECT *, SUM(new_session)
      |    OVER (PARTITION BY user_id ORDER BY ts_us
      |          ROWS UNBOUNDED PRECEDING) AS session_id
      |  FROM e)
      |SELECT user_id,
      |  MIN(ts_us) AS session_start_us,
      |  MAX(ts_us) + 1800000000 AS session_end_us,
      |  COUNT(*) AS n_events
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_start_us""".stripMargin

  /** Streaming materialized view with time travel
    * ([[graft.streaming.EventStream.streamingMaterializedAgg]]): four
    * micro-batches fold into a per-user aggregate table through the
    * associative merge law, each refresh committed as a full-replace
    * snapshot version. The settled latest version hash-matches the batch
    * aggregate — incremental ETL ≡ recompute, certified cross-engine. */
  def q_stream_matview(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_mv_${math.abs(dir.hashCode)}")
    val table = new File("target/qtmp_stream",
      s"mvtable_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(table)
    EventStream.streamingMaterializedAgg(s, s"$dir/events.parquet",
        cp.getAbsolutePath, table.getAbsolutePath)
      .orderBy("user_id")
  }

  val q_stream_matview_sql: String =
    """SELECT user_id, count(*) AS n_events,
      |  max(epoch_us(ts)) AS last_ts_us
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin

  /** The materialized view KILLED between micro-batches and resumed from
    * the Spark checkpoint
    * ([[graft.streaming.EventStream.streamingMaterializedAggResumed]]):
    * run 1 drains half the source files and stops; run 2 cold-restarts
    * from the same checkpoint and drains the rest. Hash-matching the
    * one-shot batch oracle proves the resumed stream converges to the
    * uninterrupted result — no lost batches, no double-merged replays
    * (the exactly-once `#batch=` manifest guard). */
  def q_stream_matview_resume(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_mvr_${math.abs(dir.hashCode)}")
    val table = new File("target/qtmp_stream",
      s"mvrtable_${math.abs(dir.hashCode)}")
    val live = EventStream.matviewLiveDir(s"$dir/events.parquet",
      cp.getAbsolutePath)
    deleteRec(cp); deleteRec(table); deleteRec(live)
    EventStream.streamingMaterializedAggResumed(s, s"$dir/events.parquet",
        cp.getAbsolutePath, table.getAbsolutePath)
      .orderBy("user_id")
  }

  val q_stream_matview_resume_sql: String = q_stream_matview_sql

  /** Continuous append ingestion into the versioned snapshot log
    * ([[graft.streaming.EventStream.streamingLakeIngest]]): the event
    * stream lands epoch-per-micro-batch with the exactly-once `#batch=`
    * guard, and the settled latest version must hold EXACTLY the source
    * table — hash-matched row-for-row against DuckDB reading the raw
    * parquet. The continuous corpus-ingest front door: versioned while
    * it ingests, consumers read manifest-exact snapshots, compaction and
    * vacuum run behind. */
  def q_stream_lakeingest(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_lake_${math.abs(dir.hashCode)}")
    val table = new File("target/qtmp_stream",
      s"laketable_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(table)
    EventStream.streamingLakeIngest(s, s"$dir/events.parquet",
        cp.getAbsolutePath, table.getAbsolutePath)
      .orderBy("user_id", "ts_us", "event_type")
  }

  val q_stream_lakeingest_sql: String =
    """SELECT user_id, epoch_us(ts) AS ts_us, event_type, value
      |FROM events ORDER BY user_id, ts_us, event_type""".stripMargin

  /** Continuous ingestion into a PARTITIONED lake table
    * ([[graft.streaming.EventStream.streamingLakeIngestPartitioned]]):
    * each micro-batch commits one `event_type`-partitioned epoch under
    * the exactly-once `#batch=` guard, and the settled table is read
    * back PARTITION-PRUNED (`event_type = 'click'`) straight from the
    * manifest — certifying the streamed write AND the manifest-only
    * partition elimination in one gate. Oracle: the click rows. */
  def q_stream_lakeingest_part(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_lakep_${math.abs(dir.hashCode)}")
    val table = new File("target/qtmp_stream",
      s"laketable_p_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(table)
    EventStream.streamingLakeIngestPartitioned(s, s"$dir/events.parquet",
        cp.getAbsolutePath, table.getAbsolutePath, readType = "click")
      .orderBy("user_id", "ts_us")
  }

  val q_stream_lakeingest_part_sql: String =
    """SELECT user_id, epoch_us(ts) AS ts_us, event_type, value
      |FROM events WHERE event_type = 'click'
      |ORDER BY user_id, ts_us""".stripMargin

  /** The MEDALLION pipeline over the `graftlake` STREAMING SOURCE
    * ([[graft.streaming.LakeStream.medallionClicks]]): a bronze lake
    * table built as three append commits is streamed BY VERSION OFFSET
    * (`readStream.format("graftlake")`, one micro-batch per commit via
    * `maxVersionsPerTrigger=1`, every batch planned purely from the
    * manifests), filtered to clicks, and landed in a silver lake table
    * under the exactly-once `#batch=` guard. The settled silver table
    * must equal the one-shot batch transform of the raw events — which
    * is what DuckDB replays with no engine involvement. The lake's
    * streaming READ half: restartable at both ends, versions are
    * offsets, metadata cost per trigger proportional to new commits. */
  def q_stream_medallion(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_med_${math.abs(dir.hashCode)}")
    val bronze = new File("target/qtmp_stream",
      s"medbronze_${math.abs(dir.hashCode)}")
    val silver = new File("target/qtmp_stream",
      s"medsilver_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(bronze); deleteRec(silver)
    graft.streaming.LakeStream.medallionClicks(s, s"$dir/events.parquet",
        cp.getAbsolutePath, bronze.getAbsolutePath,
        silver.getAbsolutePath)
      .orderBy("user_id", "ts_us", "value")
  }

  val q_stream_medallion_sql: String =
    """SELECT user_id, epoch_us(ts) AS ts_us, value
      |FROM events WHERE event_type = 'click'
      |ORDER BY user_id, ts_us, value""".stripMargin

  /** Materialized view through the `graftlake` sink's Complete mode
    * ([[graft.streaming.LakeStream.matviewStream]]): a streaming
    * aggregation whose every refresh is a head-replacing snapshot
    * commit under the exactly-once guard — the matview the foreachBatch
    * pipelines hand-rolled, reduced to `outputMode("complete")` +
    * `format("graftlake")`. The settled head must equal the one-shot
    * batch aggregation. */
  def q_stream_lakematview(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_lmv_${math.abs(dir.hashCode)}")
    val bronze = new File("target/qtmp_stream",
      s"lmvbronze_${math.abs(dir.hashCode)}")
    val mv = new File("target/qtmp_stream",
      s"lmvtable_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(bronze); deleteRec(mv)
    graft.streaming.LakeStream.matviewStream(s, s"$dir/events.parquet",
        cp.getAbsolutePath, bronze.getAbsolutePath, mv.getAbsolutePath)
      .orderBy("user_id")
  }

  val q_stream_lakematview_sql: String =
    """SELECT user_id, count(*) AS n_events,
      |  max(epoch_us(ts)) AS last_ts_us
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin

  /** STREAMING CORPUS CURATION
    * ([[graft.streaming.LakeStream.curationStream]]): the raw documents
    * bronze table streamed version-per-batch, scored with the
    * integer-exact quality + language-ID kernels, filtered
    * (`quality >= 60 AND lang_pred != 'und'`), and landed in a curated
    * silver lake table — `format("graftlake")` at both ends,
    * exactly-once, time-travel-readable throughout. DuckDB replays the
    * identical score formulas over the raw parquet. */
  def q_stream_curate(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_cur_${math.abs(dir.hashCode)}")
    val bronze = new File("target/qtmp_stream",
      s"curbronze_${math.abs(dir.hashCode)}")
    val silver = new File("target/qtmp_stream",
      s"cursilver_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(bronze); deleteRec(silver)
    graft.streaming.LakeStream.curationStream(s,
        s"$dir/documents.parquet", cp.getAbsolutePath,
        bronze.getAbsolutePath, silver.getAbsolutePath)
      .orderBy("doc_id")
  }

  val q_stream_curate_sql: String = {
    val q = graft.operators.TextAnalysis.qualityScoreSql("text")
    val l = graft.operators.TextAnalysis.langIdSql("text")
    s"""SELECT doc_id, lang, $q AS quality, $l AS lang_pred
       |FROM documents
       |WHERE $q >= 60 AND $l != 'und'
       |ORDER BY doc_id""".stripMargin
  }

  /** Streaming UPSERT through the `graftlake` SINK's Update mode
    * ([[graft.streaming.LakeStream.medallionUpsert]]): the bronze event
    * log streamed version-per-batch and merged into a keyed silver
    * table by `writeStream.outputMode("update").option("mergeKeys",
    * ...)` — the sink owns both the exactly-once `#batch=` guard and
    * the order-resolved merge, so CDC apply is zero caller code. The
    * settled table must equal the GLOBAL per-key resolution (the
    * associativity law), replayed by DuckDB with one window. */
  def q_stream_lakeupsert(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_lup_${math.abs(dir.hashCode)}")
    val bronze = new File("target/qtmp_stream",
      s"lupbronze_${math.abs(dir.hashCode)}")
    val silver = new File("target/qtmp_stream",
      s"lupsilver_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(bronze); deleteRec(silver)
    graft.streaming.LakeStream.medallionUpsert(s, s"$dir/events.parquet",
        cp.getAbsolutePath, bronze.getAbsolutePath,
        silver.getAbsolutePath)
      .orderBy("event_type", "user_id")
  }

  val q_stream_lakeupsert_sql: String =
    """SELECT user_id, ts_us, event_type, value FROM (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_type, value,
      |    row_number() OVER (PARTITION BY event_type, user_id
      |                       ORDER BY epoch_us(ts) DESC, value DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY event_type, user_id""".stripMargin

  /** Streaming UPSERT with the ZONE-PRUNED merge layout
    * ([[graft.streaming.LakeStream.medallionUpsertClustered]]): same
    * CDC-apply pipeline as `q_stream_lakeupsert`, but the silver table
    * is kept key-clustered (`clusterBy` sink option) so each
    * micro-batch rewrites only the files whose key zone overlaps the
    * batch — the file-scoped Update path. The oracle is IDENTICAL to
    * the full-rewrite gate: layout must change I/O, never rows. */
  def q_stream_lakeupsert_clustered(s: SparkSession,
      dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_lupc_${math.abs(dir.hashCode)}")
    val bronze = new File("target/qtmp_stream",
      s"lupcbronze_${math.abs(dir.hashCode)}")
    val silver = new File("target/qtmp_stream",
      s"lupcsilver_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(bronze); deleteRec(silver)
    graft.streaming.LakeStream.medallionUpsertClustered(s,
        s"$dir/events.parquet", cp.getAbsolutePath,
        bronze.getAbsolutePath, silver.getAbsolutePath)
      .orderBy("event_type", "user_id")
  }

  val q_stream_lakeupsert_clustered_sql: String =
    """SELECT user_id, ts_us, event_type, value FROM (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_type, value,
      |    row_number() OVER (PARTITION BY event_type, user_id
      |                       ORDER BY epoch_us(ts) DESC, value DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY event_type, user_id""".stripMargin

  /** Streaming UPSERT as MERGE-ON-READ commits
    * ([[graft.streaming.LakeStream.medallionUpsertMoR]]): the same
    * CDC-apply pipeline as `q_stream_lakeupsert`, but each micro-batch
    * commits O(batch) — deletion vectors for the beaten incumbents +
    * a zoned winners epoch (`morUpsert` + `clusterBy` sink options),
    * with `autoCompactEvery` materializing the DVs mid-stream under
    * the exactly-once guard. Oracle IDENTICAL to the full-rewrite and
    * clustered-CoW gates: commit shape changes I/O, never rows. */
  def q_stream_lakeupsert_mor(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_lupm_${math.abs(dir.hashCode)}")
    val bronze = new File("target/qtmp_stream",
      s"lupmbronze_${math.abs(dir.hashCode)}")
    val silver = new File("target/qtmp_stream",
      s"lupmsilver_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(bronze); deleteRec(silver)
    graft.streaming.LakeStream.medallionUpsertMoR(s,
        s"$dir/events.parquet", cp.getAbsolutePath,
        bronze.getAbsolutePath, silver.getAbsolutePath)
      .orderBy("event_type", "user_id")
  }

  val q_stream_lakeupsert_mor_sql: String =
    """SELECT user_id, ts_us, event_type, value FROM (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_type, value,
      |    row_number() OVER (PARTITION BY event_type, user_id
      |                       ORDER BY epoch_us(ts) DESC, value DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY event_type, user_id""".stripMargin

  /** Sink retention housekeeping end to end
    * ([[graft.sources.GraftLakeSink]] `autoCompactEvery` +
    * `autoVacuumKeep`): the corpus lands through six exactly-once
    * micro-batch commits while the sink folds small epochs every third
    * version and drops all but the newest two — the long-lived
    * streamed-table configuration. Retention must be INVISIBLE to the
    * data: the settled table equals the plain corpus (DuckDB replays
    * it directly), while the in-gate requires pin the log actually
    * stayed bounded. */
  def q_stream_lakehousekeeping(s: SparkSession,
      dir: String): DataFrame = {
    val table = new File("target/qtmp_stream",
      s"lhk_${math.abs(dir.hashCode)}")
    deleteRec(table)
    val docs = s.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "n_chars")
    val sink = new graft.sources.GraftLakeSink(s,
      Map("path" -> table.getAbsolutePath,
        "autoCompactEvery" -> "3", "autoVacuumKeep" -> "2",
        "autoVacuumHorizonMs" -> "0"),
      Seq.empty, org.apache.spark.sql.streaming.OutputMode.Append())
    (0 until 6).foreach { b =>
      sink.addBatch(b, docs.filter(pmod(col("doc_id"), lit(6)) === b))
      sink.addBatch(b, docs.limit(5)) // replay storm: refused
    }
    val od = table.getAbsolutePath
    require(graft.operators.Export.snapshotVersions(od).size <= 2,
      "retention left an unbounded version log")
    require(graft.operators.Export.lastAppliedBatch(od) == 5L,
      "exactly-once watermark lost through compaction/retention")
    graft.operators.Export.readSnapshot(s, od,
        graft.operators.Export.latestSnapshotVersion(od))
      .orderBy("doc_id")
  }

  val q_stream_lakehousekeeping_sql: String =
    """SELECT doc_id, n_chars FROM documents ORDER BY doc_id""".stripMargin

  /** CHANGE-DATA-FEED streaming read
    * ([[graft.streaming.LakeStream.cdfDocuments]]): a documents lake
    * table built as two appends then a copy-on-write DELETE is streamed
    * with `readChangeFeed=true` — per-version changes tagged
    * `_change` (insert/delete) + `_commit_version`, the Delta CDF
    * shape, so the delete commit flows downstream as delete rows
    * instead of failing the appends-only stream. The landed feed must
    * equal the from-first-principles change log of the three commits,
    * replayed by DuckDB from the raw parquet. */
  def q_stream_lakecdf(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_lcdf_${math.abs(dir.hashCode)}")
    val table = new File("target/qtmp_stream",
      s"lcdftable_${math.abs(dir.hashCode)}")
    val feed = new File("target/qtmp_stream",
      s"lcdffeed_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(table); deleteRec(feed)
    graft.streaming.LakeStream.cdfDocuments(s, s"$dir/documents.parquet",
        cp.getAbsolutePath, table.getAbsolutePath, feed.getAbsolutePath)
      .orderBy("doc_id", "_change", "_commit_version")
  }

  val q_stream_lakecdf_sql: String =
    """SELECT * FROM (
      |  SELECT doc_id, lang, n_chars, 'insert' AS _change,
      |    CAST(1 AS BIGINT) AS _commit_version
      |  FROM documents WHERE doc_id % 2 = 0
      |  UNION ALL
      |  SELECT doc_id, lang, n_chars, 'insert', 2
      |  FROM documents WHERE doc_id % 2 = 1
      |  UNION ALL
      |  SELECT doc_id, lang, n_chars, 'delete', 3
      |  FROM documents WHERE lang = 'en')
      |ORDER BY doc_id, _change, _commit_version""".stripMargin

  /** Streaming APPLY CHANGES
    * ([[graft.streaming.EventStream.streamingCdcApply]]): an unordered
    * keyed change feed applied micro-batch-at-a-time into a partitioned
    * lake table with ORDER-RESOLVED merges — per (event_type, user_id)
    * the max-by-(ts_us, value) record survives. Associativity of that
    * resolution is the whole point: the settled table must equal the
    * GLOBAL per-key resolution regardless of how the feed was batched,
    * which is exactly what DuckDB replays with one window. */
  def q_stream_cdc_apply(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_cdc_${math.abs(dir.hashCode)}")
    val table = new File("target/qtmp_stream",
      s"cdctable_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(table)
    EventStream.streamingCdcApply(s, s"$dir/events.parquet",
        cp.getAbsolutePath, table.getAbsolutePath)
      .orderBy("event_type", "user_id")
  }

  val q_stream_cdc_apply_sql: String =
    """SELECT event_type, user_id, ts_us, value FROM (
      |  SELECT event_type, user_id, epoch_us(ts) AS ts_us, value,
      |    row_number() OVER (PARTITION BY event_type, user_id
      |                       ORDER BY epoch_us(ts) DESC, value DESC) AS rn
      |  FROM events) WHERE rn = 1
      |ORDER BY event_type, user_id""".stripMargin

  /** [[q_stream_cdc_apply]] KILLED mid-feed and resumed
    * ([[graft.streaming.EventStream.streamingCdcApplyResumed]]): half
    * the change files, drain, clean stop; the rest appear, cold restart
    * from the same checkpoint. The settled table hash-matches the SAME
    * global-resolution oracle — convergence across the kill is exactly
    * the order-resolved merge's associativity, plus the `#batch=` guard
    * refusing every redelivered batch. */
  def q_stream_cdc_resume(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_cdcr_${math.abs(dir.hashCode)}")
    val table = new File("target/qtmp_stream",
      s"cdcrtable_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(table)
    EventStream.streamingCdcApplyResumed(s, s"$dir/events.parquet",
        cp.getAbsolutePath, table.getAbsolutePath)
      .orderBy("event_type", "user_id")
  }

  val q_stream_cdc_resume_sql: String = q_stream_cdc_apply_sql

  /** CDC apply with DELETE records
    * ([[graft.streaming.EventStream.streamingCdcApplyDeletes]]):
    * `error` events are tombstones for their user key; the visible
    * settled state is every key whose ORDER-RESOLVED winner is not a
    * delete. Tombstones are retained in the table (dropping one would
    * let an out-of-order earlier update resurrect the key), so DuckDB's
    * replay — one window over the whole feed, then filter the
    * delete-winners — must hash-match the tombstone-filtered read. */
  def q_stream_cdc_deletes(s: SparkSession, dir: String): DataFrame = {
    val cp = new File("target/qtmp_stream",
      s"cp_cdcd_${math.abs(dir.hashCode)}")
    val table = new File("target/qtmp_stream",
      s"cdcdtable_${math.abs(dir.hashCode)}")
    deleteRec(cp); deleteRec(table)
    EventStream.streamingCdcApplyDeletes(s, s"$dir/events.parquet",
        cp.getAbsolutePath, table.getAbsolutePath)
      .orderBy("user_id")
  }

  val q_stream_cdc_deletes_sql: String =
    """SELECT user_id, ts_us, value FROM (
      |  SELECT user_id, epoch_us(ts) AS ts_us, value,
      |    (event_type = 'error') AS is_del,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts) DESC, value DESC,
      |               (event_type = 'error') DESC) AS rn
      |  FROM events) WHERE rn = 1 AND NOT is_del
      |ORDER BY user_id""".stripMargin

  /** Incremental sessionization with event-time timeouts
    * ([[graft.streaming.EventStream.sessionizeTimeout]]): sessions emit
    * exactly once via successor-gap closure OR watermark timeout, and
    * still-open sessions are withheld — the bounded-state production
    * sessionizer, all three paths pinned by construction. */
  def q_stream_session_timeout(s: SparkSession, dir: String): DataFrame = {
    val stage = new File("target/qtmp_stream", "sto_stage")
    val cp = new File("target/qtmp_stream",
      s"cp_sto_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    EventStream.sessionizeTimeout(s, stage.getAbsolutePath,
        cp.getAbsolutePath)
      .orderBy("user_id", "start_min")
  }

  val q_stream_session_timeout_sql: String =
    """WITH u AS (SELECT unnest(range(20)) AS u)
      |SELECT CAST(u AS BIGINT) AS user_id, CAST(u AS BIGINT) AS start_min,
      |  CAST(u + 10 AS BIGINT) AS end_min, CAST(3 AS BIGINT) AS n_events
      |FROM u
      |UNION ALL
      |SELECT CAST(u AS BIGINT), CAST(u + 100 AS BIGINT),
      |  CAST(u + 105 AS BIGINT), CAST(2 AS BIGINT)
      |FROM u
      |ORDER BY user_id, start_min""".stripMargin

  /** Bounded-state streaming dedup
    * ([[graft.streaming.EventStream.streamingDedupBounded]] —
    * `dropDuplicatesWithinWatermark`): in-horizon duplicates drop,
    * and a replay of a key whose state the watermark already evicted
    * legitimately RE-EMITS — the state-bounding trade spelled out as
    * data. DuckDB replays the exact emission set. */
  def q_stream_dedup_bounded(s: SparkSession, dir: String): DataFrame = {
    val stage = new File("target/qtmp_stream", "dwb_stage_v2")
    val cp = new File("target/qtmp_stream",
      s"cp_dwb_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    EventStream.streamingDedupBounded(s, stage.getAbsolutePath,
        cp.getAbsolutePath)
      .orderBy("minute", "event_id")
  }

  val q_stream_dedup_bounded_sql: String =
    """SELECT CAST(i AS BIGINT) AS event_id, CAST(i AS BIGINT) AS minute
      |FROM (SELECT unnest(range(1, 101)) AS i)
      |UNION ALL
      |SELECT CAST(i AS BIGINT), CAST(i AS BIGINT)
      |FROM (SELECT unnest(range(5000, 5100)) AS i)
      |UNION ALL
      |SELECT CAST(i AS BIGINT), CAST(i AS BIGINT)
      |FROM (SELECT unnest(range(6000, 6010)) AS i)
      |UNION ALL
      |SELECT 50, 6100
      |ORDER BY minute, event_id""".stripMargin

  /** LEFT OUTER stream-stream join
    * ([[graft.streaming.EventStream.streamingStreamJoinOuter]]): matched
    * ads emit with their click; unclicked ads emit null-padded only once
    * the final watermark proves no click can come (imp_ts + 30 min
    * beyond the watermark horizon ⇒ withheld). The emission horizon is
    * pinned as an explicit predicate in the oracle — Spark's observed
    * deterministic boundary, replayed row-for-row by DuckDB. */
  def q_stream_join_outer(s: SparkSession, dir: String): DataFrame = {
    val stage = new File("target/qtmp_stream", "ssjo_stage")
    val cp = new File("target/qtmp_stream",
      s"cp_ssjo_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    EventStream.streamingStreamJoinOuter(s, stage.getAbsolutePath,
        cp.getAbsolutePath)
      .orderBy("i")
  }

  /** The null-emission horizon replayed from first principles: final
    * watermark = min(max imp ts, max clk ts) − 60 min; an unmatched
    * impression emits iff imp_ts + 30 min (its last possible match
    * time) is STRICTLY below it — observed i < 3909, 60 newest
    * unmatched withheld. */
  val q_stream_join_outer_sql: String =
    """WITH src AS (SELECT unnest(range(4000)) AS i),
      |params AS (SELECT least(3999 + 1440, 3999 + 1445) - 60 AS wm),
      |matched AS (
      |  SELECT i, i AS imp_min, i + 5 AS click_min
      |  FROM src WHERE i % 3 = 0),
      |unmatched AS (
      |  SELECT i, i AS imp_min, CAST(NULL AS BIGINT) AS click_min
      |  FROM src, params
      |  WHERE i % 3 != 0 AND (i + 1440) + 30 < wm)
      |SELECT CAST(i AS BIGINT) AS i, CAST(imp_min AS BIGINT) AS imp_min,
      |  CAST(click_min AS BIGINT) AS click_min
      |FROM (SELECT * FROM matched UNION ALL SELECT * FROM unmatched)
      |ORDER BY i""".stripMargin

  /** Update output mode
    * ([[graft.streaming.EventStream.streamingUpdateCounts]]): per-batch
    * emission of ONLY the changed keys, folded to (n_updates, n_final)
    * per key — users absent from the last file must show one fewer
    * update, and every final count must equal the batch aggregate.
    * Completes the output-mode matrix (Complete = sketch censuses,
    * Append = watermark/join gates). */
  def q_stream_update(s: SparkSession, dir: String): DataFrame = {
    val stage = new File("target/qtmp_stream", "upd_stage")
    val cp = new File("target/qtmp_stream",
      s"cp_upd_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    EventStream.streamingUpdateCounts(s, stage.getAbsolutePath,
        cp.getAbsolutePath)
      .orderBy("user_id")
  }

  val q_stream_update_sql: String =
    """WITH src AS (SELECT unnest(range(8000)) AS i),
      |r AS (SELECT CASE WHEN i < 6000 THEN i % 40 ELSE i % 20 END
      |  AS user_id, i // 2000 AS batch FROM src),
      |agg AS (SELECT user_id, count(DISTINCT batch) AS n_updates,
      |  count(*) AS n_final FROM r GROUP BY 1)
      |SELECT CAST(user_id AS BIGINT) AS user_id,
      |  CAST(n_updates AS BIGINT) AS n_updates,
      |  CAST(n_final AS BIGINT) AS n_final
      |FROM agg ORDER BY user_id""".stripMargin

  /** Stream-stream inner join
    * ([[graft.streaming.EventStream.streamingStreamJoin]]): impressions
    * ⋈ clicks on ad id + a 30-minute attribution window, both sides
    * watermarked 60 minutes so join state is evictable; one planted
    * late click must be discarded (the min-across-sources watermark
    * passed its event time batches earlier), so its match never
    * appears. DuckDB replays the join predicate and the drop from the
    * same synthetic input. */
  def q_stream_join(s: SparkSession, dir: String): DataFrame = {
    val stage = new File("target/qtmp_stream", "ssj_stage_v3")
    val cp = new File("target/qtmp_stream",
      s"cp_ssj_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    EventStream.streamingStreamJoin(s, stage.getAbsolutePath,
        cp.getAbsolutePath)
      .orderBy("i")
  }

  val q_stream_join_sql: String =
    """SELECT i, i AS imp_min, i + 5 AS click_min
      |FROM (SELECT unnest(range(4000)) AS i)
      |WHERE i % 3 = 0
      |ORDER BY i""".stripMargin

  /** Watermark + late-data discipline
    * ([[graft.streaming.EventStream.streamingWatermarkedCounts]]): a
    * time-ordered 4-file drain with one planted late row; Append mode +
    * a 120-minute watermark must (a) DROP the late row (its window was
    * finalized batches ago) and (b) emit exactly the windows whose end
    * the final watermark passed, withholding the tail. DuckDB replays
    * both predicates from the same synthetic `range()` input —
    * the state-bounding contract certified cross-engine. */
  def q_stream_watermark(s: SparkSession, dir: String): DataFrame = {
    val stage = new File("target/qtmp_stream", "wm_stage")
    val cp = new File("target/qtmp_stream",
      s"cp_wm_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    EventStream.streamingWatermarkedCounts(s, stage.getAbsolutePath,
        cp.getAbsolutePath)
      .orderBy("win_start_min")
  }

  val q_stream_watermark_sql: String =
    """WITH src AS (SELECT unnest(range(8000)) AS i),
      |r AS (SELECT i, CASE WHEN i = 6000 THEN 0 ELSE i END AS ts_min
      |  FROM src),
      |kept AS (SELECT ts_min FROM r WHERE i != 6000),
      |w AS (SELECT (ts_min // 60) * 60 AS win_start_min,
      |  count(*) AS n_events FROM kept GROUP BY 1)
      |SELECT CAST(win_start_min AS BIGINT) AS win_start_min,
      |  CAST(n_events AS BIGINT) AS n_events
      |FROM w WHERE win_start_min + 60 <= 7999 - 120
      |ORDER BY win_start_min""".stripMargin

  /** Funnel analysis (earliest-completion, strict order, bounded window):
    * of the users who ever `view`ed, how many went on to `click` and then
    * `purchase` within 7 days of the first view — the product-analytics
    * staple missing between sessionize and the window gates. Formulated
    * as three user-keyed min-aggregates chained by equi-joins (step k's
    * earliest qualifying timestamp feeds step k+1's lower bound): fully
    * declarative, three user-keyed shuffles, no per-user event-history
    * materialization, no UDF — the shape that survives a 100× user count.
    * DuckDB replays the same chain. */
  def q_funnel(s: SparkSession, dir: String): DataFrame = {
    val wUs = 7L * 24 * 3600 * 1000000L
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("t1"))
    val s2 = ev.filter(col("event_type") === "click").join(s1, "user_id")
      .filter(col("ts") >= col("t1") && col("ts") <= col("t1") + wUs)
      .groupBy("user_id").agg(min("ts").as("t2"), min("t1").as("t1"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") >= col("t2") && col("ts") <= col("t1") + wUs)
      .groupBy("user_id").agg(min("ts").as("t3"))
    def rowOf(step: Int, name: String, d: DataFrame) =
      d.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(name).as("event_type"),
          col("n_users").cast("long").as("n_users"))
    rowOf(1, "view", s1)
      .unionByName(rowOf(2, "click", s2))
      .unionByName(rowOf(3, "purchase", s3))
      .orderBy("step")
  }

  val q_funnel_sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_type FROM events),
      |s1 AS (SELECT user_id, min(ts) AS t1 FROM e
      |       WHERE event_type = 'view' GROUP BY 1),
      |s2 AS (SELECT e.user_id, min(e.ts) AS t2, min(t1) AS t1
      |       FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'click' AND e.ts >= t1
      |         AND e.ts <= t1 + 604800000000 GROUP BY 1),
      |s3 AS (SELECT e.user_id, min(e.ts) AS t3
      |       FROM e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND e.ts >= t2
      |         AND e.ts <= t1 + 604800000000 GROUP BY 1)
      |SELECT * FROM (
      |  SELECT 1 AS step, 'view' AS event_type,
      |    (SELECT count(*) FROM s1) AS n_users
      |  UNION ALL SELECT 2, 'click', (SELECT count(*) FROM s2)
      |  UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM s3))
      |ORDER BY step""".stripMargin

  /** Cohort retention (the funnel's sibling staple): bucket users by the
    * week of their FIRST event (the cohort), then for each week offset
    * count how many of that cohort were active — the retention triangle.
    * Weeks are integer floor-divisions of epoch-µs (no calendar logic to
    * drift between engines); the plan is one user-keyed min-aggregate,
    * one distinct over (user, week) — both map-side combined — and one
    * cohort-keyed count: three bounded shuffles at any scale. */
  def q_retention(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 604800000000").as("wk"))
    val first = ev.groupBy("user_id").agg(min("wk").as("cohort"))
    ev.distinct().join(first, "user_id")
      .withColumn("offset", col("wk") - col("cohort"))
      .filter(col("offset") <= 3)
      .groupBy("cohort", "offset")
      .agg(countDistinct("user_id").as("n_active"))
      .orderBy("cohort", "offset")
  }

  val q_retention_sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk
      |           FROM events),
      |f AS (SELECT user_id, min(wk) AS cohort FROM e GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, wk FROM e)
      |SELECT cohort, wk - cohort AS "offset",
      |  count(DISTINCT user_id) AS n_active
      |FROM a JOIN f USING (user_id)
      |WHERE wk - cohort <= 3
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Event-path transitions: counts of consecutive (from → to) event pairs
    * per user in timestamp order — the Markov-transition census behind
    * path analysis. One user-keyed window (lead over (ts, event_type) —
    * the event_type tie-break keeps simultaneous events deterministic)
    * and one count aggregate; both shuffles are key-bounded at any
    * scale. */
  def q_transitions(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_type"))
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_type"))
      .withColumn("next_type", lead("event_type", 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy("from_type", "to_type")
  }

  val q_transitions_sql: String =
    """WITH e AS (SELECT user_id, epoch_us(ts) AS ts, event_type FROM events),
      |t AS (SELECT event_type AS from_type,
      |        lead(event_type) OVER (PARTITION BY user_id
      |          ORDER BY ts, event_type) AS to_type
      |      FROM e)
      |SELECT from_type, to_type, count(*) AS n
      |FROM t WHERE to_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** JSON column surface (reference type table §1.2: JSON → StringType +
    * from_json/get_json_object): extract, validate, aggregate. */
  def q_json(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        count(col("k")).as("n_valid"),
        sum(col("k")).as("k_sum"),
        min(col("k")).as("k_min"),
        max(col("k")).as("k_max"))
  }

  val q_json_sql: String =
    """SELECT event_type,
      | COUNT(CAST(json_extract(props, '$.k') AS BIGINT)) AS n_valid,
      | CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
      | MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_min,
      | MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS k_max
      |FROM events GROUP BY event_type""".stripMargin

  private def deleteRec(f: File): Unit = graft.util.Dirs.deleteRec(f)
}
