package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.operators.Export
import graft.streaming.EventStream.withStreamShuffle

/** Lake-to-lake streaming pipelines over the `graftlake` source
  * ([[graft.sources.GraftLakeDataSource]]) — the medallion shape every
  * production corpus runs: a BRONZE table ingests raw commits, a stream
  * reads bronze BY VERSION OFFSET (planned purely from manifests) and
  * lands refined rows in a SILVER table under the exactly-once
  * `#batch=` guard. End-to-end the pipeline is restartable at both
  * ends: the source resumes from the engine's offset log (versions ARE
  * offsets), the sink refuses replayed micro-batches, and every
  * intermediate state of both tables time-travels. */
object LakeStream {

  /** Build a bronze table from `srcParquet` in `nSlices` deterministic
    * append commits (sliced on `user_id % nSlices` — stable, disjoint,
    * complete), so the downstream stream provably sees multiple
    * versions. Events columns normalized to the engine's epoch-µs
    * contract at the bronze boundary. */
  private def buildBronzeEvents(spark: SparkSession, srcParquet: String,
      bronzeDir: String, nSlices: Int): Unit = {
    val base = spark.read.parquet(srcParquet)
      .select("user_id", "ts", "event_type", "value")
    val tsType = base.schema("ts").dataType
    val rows = base.select(col("user_id"),
      graft.util.Tables.tsMicros(tsType).as("ts_us"),
      col("event_type"), col("value"))
    (0 until nSlices).foreach { k =>
      Export.appendSnapshot(spark,
        rows.filter(pmod(col("user_id"), lit(nSlices)) === k), bronzeDir)
    }
  }

  /** Bronze → silver: stream the bronze EVENTS table version-by-version
    * (`maxVersionsPerTrigger=1` — one micro-batch per commit, the
    * catch-up discipline a 100 TB log needs), keep the `click` rows,
    * and append each micro-batch to the silver table under the
    * exactly-once guard. Returns the settled silver read: it must equal
    * the one-shot batch transform of the raw source — which is exactly
    * what the DuckDB oracle replays. */
  def medallionClicks(spark: SparkSession, srcParquet: String,
      checkpointDir: String, bronzeDir: String,
      silverDir: String): DataFrame = {
    buildBronzeEvents(spark, srcParquet, bronzeDir, nSlices = 3)
    // filter + projection as SOURCE options: applied inside each batch
    // plan, so they reach the parquet scan as PushedFilters/ReadSchema
    // (a downstream .filter can't cross the DSv1 row boundary)
    val stream = spark.readStream.format("graftlake")
      .option("maxVersionsPerTrigger", "1")
      .option("where", "event_type = 'click'")
      .option("select", "user_id,ts_us,value")
      .load(bronzeDir)
    withStreamShuffle(spark) {
      // pure format API at both ends: the sink owns the exactly-once
      // #batch= guard, no foreachBatch boilerplate
      val q = stream.writeStream.format("graftlake")
        .option("path", silverDir)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Export.readSnapshot(spark, silverDir,
      Export.latestSnapshotVersion(silverDir))
  }

  /** Streaming UPSERT through the sink's Update mode: the bronze event
    * log streamed version-per-batch and merged into a keyed silver
    * table with ORDER-RESOLVED merges — per (event_type, user_id) the
    * max-by-(ts_us, value) record survives, so however the feed is
    * batched, the settled table equals the GLOBAL per-key resolution
    * (associativity of [[graft.operators.Merge.upsertLatest]]), which
    * is what the oracle replays with one window. The
    * `writeStream.outputMode("update").option("mergeKeys", ...)` shape —
    * CDC apply with zero caller code. */
  def medallionUpsert(spark: SparkSession, srcParquet: String,
      checkpointDir: String, bronzeDir: String,
      silverDir: String): DataFrame = {
    buildBronzeEvents(spark, srcParquet, bronzeDir, nSlices = 3)
    val stream = spark.readStream.format("graftlake")
      .option("maxVersionsPerTrigger", "1")
      .load(bronzeDir)
    withStreamShuffle(spark) {
      val q = stream.writeStream.format("graftlake")
        .option("path", silverDir)
        .option("mergeKeys", "event_type,user_id")
        .option("orderBy", "ts_us,value")
        // small keyed state table: the O(table)-per-batch full rewrite
        // is the right trade here, acknowledged explicitly (the sink
        // refuses unpartitioned Update without it)
        .option("allowFullRewrite", "true")
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Export.readSnapshot(spark, silverDir,
      Export.latestSnapshotVersion(silverDir))
  }

  /** [[medallionUpsert]] with the ZONE-PRUNED merge layout: the silver
    * table is kept clustered on `user_id` (`clusterBy` option), so each
    * micro-batch rewrites only the files whose key zone overlaps the
    * batch's envelope — the file-granular Update path that replaces the
    * O(table)-per-batch full rewrite. The settled table must STILL
    * equal the global per-key resolution (the same oracle as the
    * full-rewrite sink — layout changes I/O, never rows). */
  def medallionUpsertClustered(spark: SparkSession, srcParquet: String,
      checkpointDir: String, bronzeDir: String,
      silverDir: String): DataFrame = {
    buildBronzeEvents(spark, srcParquet, bronzeDir, nSlices = 3)
    val stream = spark.readStream.format("graftlake")
      .option("maxVersionsPerTrigger", "1")
      .load(bronzeDir)
    withStreamShuffle(spark) {
      val q = stream.writeStream.format("graftlake")
        .option("path", silverDir)
        .option("mergeKeys", "event_type,user_id")
        .option("orderBy", "ts_us,value")
        .option("clusterBy", "user_id")
        .option("filesPerCommit", "4")
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Export.readSnapshot(spark, silverDir,
      Export.latestSnapshotVersion(silverDir))
  }

  /** CDC apply as MERGE-ON-READ commits ([[Export.upsertSnapshotMoR]]
    * behind the sink's `morUpsert` option): each micro-batch writes
    * O(batch) — beaten incumbents become deletion-vector positions,
    * winners append as a zoned epoch (`clusterBy` scopes the matched-
    * key scan to zone-overlapping files), and `autoCompactEvery` folds
    * the accumulated DVs back into clean files mid-stream WITHOUT
    * breaking the exactly-once guard. The settled table must STILL
    * equal the global per-key resolution — same oracle as the
    * full-rewrite and clustered-CoW gates: commit shape changes I/O,
    * never rows. */
  def medallionUpsertMoR(spark: SparkSession, srcParquet: String,
      checkpointDir: String, bronzeDir: String,
      silverDir: String): DataFrame = {
    buildBronzeEvents(spark, srcParquet, bronzeDir, nSlices = 3)
    val stream = spark.readStream.format("graftlake")
      .option("maxVersionsPerTrigger", "1")
      .load(bronzeDir)
    withStreamShuffle(spark) {
      val q = stream.writeStream.format("graftlake")
        .option("path", silverDir)
        .option("mergeKeys", "event_type,user_id")
        .option("orderBy", "ts_us,value")
        .option("clusterBy", "user_id")
        .option("morUpsert", "true")
        .option("autoCompactEvery", "2")
        .option("filesPerCommit", "4")
        .outputMode(OutputMode.Update())
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Export.readSnapshot(spark, silverDir,
      Export.latestSnapshotVersion(silverDir))
  }

  /** MATERIALIZED VIEW through the sink's Complete mode: a streaming
    * aggregation over the bronze log, each refresh committed as a
    * head-REPLACING snapshot ([[graft.operators.Export.replaceSnapshot]]
    * under the sink's exactly-once guard) — the matview pattern the
    * foreachBatch pipelines hand-rolled, now
    * `groupBy(...).agg(...).writeStream.format("graftlake")
    * .outputMode("complete")` and nothing else. Every refresh
    * time-travels; the settled head must equal the one-shot batch
    * aggregation, which the oracle replays. */
  def matviewStream(spark: SparkSession, srcParquet: String,
      checkpointDir: String, bronzeDir: String,
      mvDir: String): DataFrame = {
    buildBronzeEvents(spark, srcParquet, bronzeDir, nSlices = 3)
    val stream = spark.readStream.format("graftlake")
      .option("maxVersionsPerTrigger", "1")
      .option("select", "user_id,ts_us")
      .load(bronzeDir)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_events"),
        max(col("ts_us")).as("last_ts_us"))
    withStreamShuffle(spark) {
      val q = stream.writeStream.format("graftlake")
        .option("path", mvDir)
        .outputMode(OutputMode.Complete())
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Export.readSnapshot(spark, mvDir,
      Export.latestSnapshotVersion(mvDir))
  }

  /** STREAMING CORPUS CURATION — the production composition this
    * round's format exists for: a raw documents bronze table (three
    * append commits) streamed version-per-batch, scored with the
    * engine's integer-exact quality/language kernels, filtered, and
    * landed in a curated silver lake table — `format("graftlake")` at
    * both ends, exactly-once by construction, every intermediate state
    * of both tables time-travel-readable while the stream runs. The
    * settled silver must equal the one-shot batch curation of the raw
    * corpus, which DuckDB replays from the identical score formulas. */
  def curationStream(spark: SparkSession, srcParquet: String,
      checkpointDir: String, bronzeDir: String,
      silverDir: String): DataFrame = {
    val docs = spark.read.parquet(srcParquet)
      .select("doc_id", "lang", "text")
    (0 until 3).foreach { k =>
      Export.appendSnapshot(spark,
        docs.filter(pmod(col("doc_id"), lit(3)) === k), bronzeDir)
    }
    val stream = spark.readStream.format("graftlake")
      .option("maxVersionsPerTrigger", "1")
      .load(bronzeDir)
      .select(col("doc_id"), col("lang"),
        graft.operators.TextAnalysis.qualityScore(col("text"))
          .as("quality"),
        graft.operators.TextAnalysis.langId(col("text"))
          .as("lang_pred"))
      .filter(col("quality") >= 60 && col("lang_pred") =!= "und")
    withStreamShuffle(spark) {
      val q = stream.writeStream.format("graftlake")
        .option("path", silverDir)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Export.readSnapshot(spark, silverDir,
      Export.latestSnapshotVersion(silverDir))
  }

  /** CHANGE-DATA-FEED consumption: a documents table built as two
    * appends (`doc_id % 2`) then a copy-on-write DELETE
    * (`lang = 'en'`), streamed with `readChangeFeed=true` — every
    * commit kind is legal in CDF mode, and the delete commit arrives
    * downstream as `delete` rows. The feed lands in a result table
    * under the exactly-once guard; the settled feed must equal the
    * from-first-principles change log of those three commits, which the
    * oracle replays from the raw parquet with no engine involvement. */
  def cdfDocuments(spark: SparkSession, srcParquet: String,
      checkpointDir: String, tableDir: String,
      feedDir: String): DataFrame = {
    val docs = spark.read.parquet(srcParquet)
      .select("doc_id", "lang", "n_chars")
    Export.appendSnapshot(spark,
      docs.filter(pmod(col("doc_id"), lit(2)) === 0), tableDir)
    Export.appendSnapshot(spark,
      docs.filter(pmod(col("doc_id"), lit(2)) === 1), tableDir)
    Export.deleteWhere(spark, tableDir, col("lang") === "en")
    val stream = spark.readStream.format("graftlake")
      .option("readChangeFeed", "true")
      .option("maxVersionsPerTrigger", "1")
      .load(tableDir)
    withStreamShuffle(spark) {
      val q = stream.writeStream.format("graftlake")
        .option("path", feedDir)
        .outputMode(OutputMode.Append())
        .option("checkpointLocation", checkpointDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Export.readSnapshot(spark, feedDir,
      Export.latestSnapshotVersion(feedDir))
  }
}
