package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Crc64
import graft.operators.{KvEncode, RowIdAllocator, SchemaAlign, SqlMode}
import graft.sinks.{CheckpointStore, ChunkState, CommitLog, JdbcSink, ParquetSink, Sink, TableState}
import graft.sources._

/** The end-to-end import pipeline: the Spark restatement of the reference's
  * fixed 6-step plan (lightning/restore/restore.go:252-287 →
  * checkRequirements, restoreSchema, restoreTables, fullCompact,
  * switchMode, cleanCheckpoints).
  *
  * Driver-side planning (discover → filter → route → schema parse) produces
  * one declarative DataFrame per target table:
  *
  *   parse(file) → permute/cast (narrow, codegen-fused) → row-id
  *   → sink write + checksum aggregate (one pass)
  *
  * Concurrency notes vs the reference: its four worker pools
  * (table/engine/chunk/io — restore.go:197-200) exist to hand-schedule
  * goroutines; Spark's stage scheduler replaces all of them. Table-level
  * ordering (small tables first) comes from the plan sort; file-level
  * parallelism from one task per file; in-row pipelining from whole-stage
  * codegen.
  */
final case class ImportConfig(
    sourceDir: String,
    outDir: String,
    csv: CsvConfig = CsvConfig(),
    // S7: charset of .sql dump + schema files — UTF-8 | GB18030 | binary |
    // auto (per-file UTF-8-validity probe, reference reader.go:35-65).
    // CSV files keep their own `csv.charset` knob.
    charset: String = "UTF-8",
    sqlMode: SqlMode = SqlMode.Lenient,
    filter: TableFilter = TableFilter(),
    routes: Seq[RouteRule] = Nil,
    checkpointEnabled: Boolean = true,
    // K6 driver selection (reference checkpoint.driver = file | mysql,
    // checkpoints.go:321-451): None = one JSON doc per state under
    // <outDir>/_state (the file driver); Some(jdbcUrl) = states in a
    // shared database (graft_table_state/graft_chunk_state), so a fleet
    // of importers coordinates resume through the target DB. The null
    // driver is checkpointEnabled = false.
    checkpointUrl: Option[String] = None,
    jobTsMicros: Long = 0L,
    // S9: byte-range chunking threshold for large .sql files (the
    // reference's MinRegionSize, const.go:23)
    minChunkBytes: Long = 256L * 1024 * 1024,
    // P4: exact row-ids need a counting pass; the default mirrors the
    // reference's size-estimated disjoint ranges (gaps allowed, S8)
    exactRowIds: Boolean = false,
    // K5: replay schemas into the session catalog (CREATE DATABASE/TABLE
    // IF NOT EXISTS over the written location)
    registerInCatalog: Boolean = false,
    // no-schema mode (reference loader.go:65, tests/no_schema/): tables
    // without a *-schema.sql take their declared shape from this catalog
    schemaCatalog: Map[(String, String), MysqlTable] = Map.empty,
    // reference --no-schema / mydumper.no-schema: the target's tables
    // pre-exist, so *-schema.sql files are IGNORED even when present and
    // every table must resolve from schemaCatalog — prevents a stale dump
    // DDL from drifting away from the real target shape
    noSchema: Boolean = false,
    // checksum strategy: true = same-pass df.observe metrics (zero extra
    // I/O, but CollectMetricsExec splits the codegen span and evaluates
    // interpreted); false = count-only observe + columnar re-scan of the
    // written parquet for the checksum (extra read, but both passes stay
    // fully codegen'd). Measured fastest wins per deployment.
    observeChecksum: Boolean = true,
    // K6 chunk granularity: commit one state per data-file group so a
    // crashed table resumes from the last finished chunk (reference
    // checkpoints.go:92-171). Applies in estimated row-id mode to the
    // parquet sink (staged writes + file reconcile) and to the JDBC sink
    // under REPLACE/IGNORE (chunk replay is idempotent); exact row-id mode
    // needs a global ordering pass and INSERT-mode JDBC is non-idempotent —
    // both fall back to table-level commits.
    chunkCheckpoints: Boolean = true,
    // target input bytes per chunk-commit group (the reference's region
    // size, const.go:23); small tables collapse to one group = one job
    chunkCommitBytes: Long = 256L * 1024 * 1024,
    // post-import ANALYZE (reference postProcess step 5, restore.go:
    // 1039-1051 + PostRestore.Analyze): refresh optimizer statistics over
    // each imported table so downstream planning doesn't start stats-blind.
    // Catalog-registered parquet tables get Spark's ANALYZE TABLE (row
    // count + size feed CBO join planning); the JDBC sink issues the
    // target database's own ANALYZE.
    postAnalyze: Boolean = true,
    // bucketed parquet output (Some(numBuckets, bucketCols)): the table is
    // written via saveAsTable with Spark bucketing + per-bucket sort on
    // the same columns, so every downstream join/aggregate keyed on them
    // is EXCHANGE-FREE — the 100 TB co-located-join shape (pre-shuffle
    // once at import, never again). Bucketing implies catalog
    // registration (bucket metadata lives in the catalog) and table-level
    // commits (bucket files are one transactional write; chunk-staged
    // appends cannot preserve the bucket layout).
    bucketBy: Option[(Int, Seq[String])] = None,
    // post-import compaction target (reference PostRestore compact,
    // restore.go:257/:984-991): Some(bytes) rewrites each imported
    // parquet table into ≈bytes-sized files after checksum+ANALYZE —
    // chunk-granular appends otherwise leave one small file per chunk
    // task. None = keep the write layout.
    compactTargetBytes: Option[Long] = None,
    // error policy (reference errorSummaries, restore.go:89-129): false =
    // raise on first table failure; true = record the failure, keep
    // importing the remaining tables, and emit a per-table error summary
    // at the end. A failed table blocks later runs over the SAME inputs
    // until checkpoint-error-ignore (keep data, resume committed chunks)
    // or checkpoint-destroy clears it — the reference's ctl contract;
    // repaired inputs (different plan fingerprint) import fresh.
    continueOnError: Boolean = false,
    // reference table-level concurrency (worker pools restore.go:197-200;
    // defaults config.go:371-389: importer table=6, tidb=NumCPU): tables
    // import on a driver-side pool so one small table's driver phases
    // (planning, commit-log writes) overlap another's executor work —
    // Spark's scheduler interleaves the jobs. 1 = sequential.
    tableConcurrency: Int = 4,
    // small-table batching threshold (the reference's thousands-of-tiny-
    // tables regime, loader.go:213-220): same-schema tables at or below
    // this many source bytes import as ONE partitioned Spark job + ONE
    // grouped checksum job instead of ~3 jobs each — per-table fixed cost
    // (Catalyst analysis, job launch, commit bookkeeping) dominates tiny
    // tables, and a thousand-table migration pays it a thousand times.
    // Applies only in fail-fast mode with the parquet sink, estimated
    // row-ids, and no bucketing (see planBatches). 0 disables.
    smallTableBytes: Long = 4L * 1024 * 1024) {

  /** Reference config.Adjust's reject rules (lightning/config/config.go:
    * 347-509, tests/cmdline_override + unused_config_keys): a problematic
    * combination fails HERE with a named message instead of surfacing as a
    * confusing parse/runtime error mid-import. Returns `this` so callers
    * can chain; the pipeline constructor validates unconditionally. */
  def validated(): ImportConfig = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"invalid config: $msg")
    if (csv.separator.length != 1)
      fail("`csv.separator` must be exactly one character long")
    if (csv.delimiter.length > 1)
      fail("`csv.delimiter` must be one character long or empty")
    if (csv.separator == csv.delimiter)
      fail("cannot use the same character for both CSV delimiter and separator")
    if (csv.backslashEscape && csv.separator == "\\")
      fail("cannot use '\\' as CSV separator when backslashEscape is true")
    if (csv.backslashEscape && csv.delimiter == "\\")
      fail("cannot use '\\' as CSV delimiter when backslashEscape is true")
    val charsets = Set("utf-8", "gb18030", "binary", "auto")
    if (!charsets(charset.toLowerCase))
      fail(s"unsupported `charset` ($charset)")
    if (!charsets(csv.charset.toLowerCase))
      fail(s"unsupported `csv.charset` (${csv.charset})")
    if (minChunkBytes <= 0) fail("`minChunkBytes` must be positive")
    if (chunkCommitBytes <= 0) fail("`chunkCommitBytes` must be positive")
    if (tableConcurrency < 1) fail("`tableConcurrency` must be >= 1")
    if (smallTableBytes < 0) fail("`smallTableBytes` must be >= 0 (0 disables)")
    checkpointUrl.foreach(u => if (!u.startsWith("jdbc:"))
      fail(s"`checkpointUrl` must be a jdbc: URL (got: $u)"))
    routes.foreach { r =>
      if (Seq(r.schemaPattern, r.tablePattern, r.targetSchema,
          r.targetTable).exists(_.isEmpty))
        fail(s"route rule needs all of schema/table pattern and target: $r")
    }
    this
  }
}

final case class TableReport(db: String, table: String, rows: Long,
    dataChecksum: Long, dataBytes: Long, dataKvs: Long, resumedSkip: Boolean,
    error: Option[String] = None)

object ImportPipeline {
  /** Stable numeric table id (role of TiDB's table ID in record keys).
    * Full 64-bit crc64 — an earlier `% 100000` gave distinct tables a
    * ~1e-5 pairwise collision chance on the KV key prefix; the id only
    * ever appears stringified inside keys, so nothing needs it small. */
  def tableId(db: String, table: String): Long =
    Crc64.checksum(s"$db.$table".getBytes("UTF-8"))
}

final class ImportPipeline(spark: SparkSession, cfg: ImportConfig,
    sink: Option[Sink] = None,
    pauser: Option[Pauser] = None,
    cancelled: () => Boolean = () => false,
    progress: Option[ProgressRegistry] = None) {

  cfg.validated() // fail fast on a rejectable combination (config.Adjust)

  private val hconf = spark.sparkContext.hadoopConfiguration
  private val log: CheckpointStore = cfg.checkpointUrl match {
    case Some(url) => new graft.sinks.JdbcCheckpointStore(url,
      new java.util.Properties(), cfg.outDir, hconf)
    case None => new CommitLog(cfg.outDir, hconf)
  }
  private val theSink = sink.getOrElse(new ParquetSink(cfg.outDir))

  /** Pause/cancel gate, checked between job submissions (chunk/table
    * granularity): a cancelJobGroup only aborts jobs already RUNNING, so
    * a cancel landing between two jobs needs this driver-side check to
    * stop the import promptly. Committed chunk states survive — a
    * canceled import resumes exactly like a crashed one. */
  private def gate(): Unit = {
    pauser.foreach(_.waitIfPaused())
    if (cancelled())
      throw new InterruptedException("import canceled")
  }

  /** Step 2-3: restore all tables; returns one report per table (in plan
    * order — small tables first — regardless of concurrency). */
  def run(): Seq[TableReport] = {
    val td0 = System.nanoTime()
    val plan = MydumpDiscovery.plan(cfg.sourceDir, cfg.filter, cfg.routes, hconf)
    if (sys.env.contains("GRAFT_TIMING")) System.err.println(
      f"[graft-timing] discover ${(System.nanoTime() - td0) / 1e9}%.3f s")
    val tables = plan.tables.filter(_.dataFiles.nonEmpty)
    progress.foreach(_.initTables(tables.map(t =>
      (t.db, t.table, t.dataFiles.map(_.size).sum))))
    def one(t: TablePlan): TableReport = {
      gate()
      progress.foreach(_.startTable(t.db, t.table))
      def ok(r: TableReport): TableReport = {
        progress.foreach(_.finishTable(t.db, t.table)); r
      }
      if (!cfg.continueOnError)
        try ok(restoreTable(t)) catch { case e: Throwable =>
          progress.foreach(_.failTable(t.db, t.table,
            String.valueOf(e.getMessage))); throw e
        }
      else try ok(restoreTable(t)) catch {
        case e: InterruptedException =>
          progress.foreach(_.failTable(t.db, t.table, "canceled"))
          throw e // cancellation is not an error
        case e: Throwable =>
          progress.foreach(_.failTable(t.db, t.table,
            String.valueOf(e.getMessage)))
          if (cfg.checkpointEnabled) {
            // preserve the PINNED ts: the rows already committed carry the
            // original run's timestamp, and error-ignore keeps this state's
            // ts for the next resume — stamping the RETRY run's cfg ts here
            // would defeat the checkpoint_timestamp contract
            val pinnedTs = log.read(t.db, t.table)
              .collect { case st if st.planFingerprint == fingerprint(t) &&
                st.jobTsMicros != 0L => st.jobTsMicros }
              .getOrElse(cfg.jobTsMicros)
            log.write(TableState(t.db, t.table, "failed", 0, 0, 0, 0,
              fingerprint(t), pinnedTs))
          }
          TableReport(t.db, t.table, 0, 0, 0, 0, resumedSkip = false,
            error = Some(String.valueOf(e.getMessage).take(500)))
      }
    }
    // small same-schema tables group into one-job batches; everything else
    // (and any table a batch defers back — prior checkpoint state, zero
    // parsed rows) runs the single-table path via `one`
    val (batches, singles) = planBatches(tables)
    def oneBatch(schema: MysqlTable, batch: Seq[TablePlan]): Seq[TableReport] = {
      gate()
      val (done, deferred) = restoreBatch(schema, batch)
      done ++ deferred.map(one)
    }
    val work: Seq[() => Seq[TableReport]] =
      singles.map(t => () => Seq(one(t))) ++
        batches.map { case (sch, b) => () => oneBatch(sch, b) }
    val unordered =
      if (cfg.tableConcurrency <= 1 || work.size <= 1) work.flatMap(_())
      else {
        // driver-side table pool (reference tableWorkers): the pool threads
        // are created HERE, on the calling thread, so Spark's inheritable
        // job-group/local properties (TaskServer cancellation) propagate
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(cfg.tableConcurrency, work.size))
        try {
          val futures = work.map { w =>
            pool.submit(new java.util.concurrent.Callable[Seq[TableReport]] {
              override def call(): Seq[TableReport] = w()
            })
          }
          futures.flatMap { f =>
            try f.get()
            catch { // unwrap so callers see the original failure
              case e: java.util.concurrent.ExecutionException =>
                throw e.getCause
            }
          }
        } finally pool.shutdownNow()
      }
    // reports in plan order regardless of batching/concurrency
    val byKey = unordered.map(r => (r.db, r.table) -> r).toMap
    val reports = tables.map(t => byKey((t.db, t.table)))
    val failed = reports.filter(_.error.nonEmpty)
    if (failed.nonEmpty) { // reference errorSummaries.emitLog
      System.err.println(s"[graft] ${failed.size} tables failed to import:")
      failed.foreach(r =>
        System.err.println(s"[graft] - ${r.db}.${r.table}: ${r.error.get}"))
    }
    reports
  }

  private def fingerprint(t: TablePlan): String = {
    val s = t.dataFiles.map(f => s"${f.path}:${f.size}").mkString("|")
    f"${Crc64.checksum(s.getBytes("UTF-8"))}%016x"
  }

  /** Caps one batch's width so the per-file lookup tables and the staging
    * write's partition count stay bounded (256 tables × ≤4 MiB default
    * threshold = ≤1 GiB per batch job). */
  private val MaxBatchTables = 256

  /** Small-table batching plan (the reference's thousands-of-tiny-tables
    * regime — small-first scheduling + tableConcurrency pool,
    * loader.go:213-220): a tiny table's import cost is ~all per-table
    * fixed cost (Catalyst analysis of the align trees, job launch, commit
    * bookkeeping — the ingest-many bench measures it), so same-schema
    * tables below `smallTableBytes` group into batches that import as ONE
    * partitioned write job + ONE grouped checksum job.
    *
    * Batching trades per-table error isolation for job amortization, so it
    * applies only in fail-fast mode: one bad row aborts the whole run
    * either way there, while continue-on-error PROMISES per-table
    * isolation a shared job cannot give. Also requires the parquet sink
    * (partitioned staging + rename publish), estimated row-ids (exact mode
    * wants a dense per-table ordering pass), and no bucketing (bucket
    * layout is a per-table saveAsTable transaction). A schema that fails
    * to parse routes to the single path so the error carries its
    * table-named message. */
  private def planBatches(tables: Seq[TablePlan])
      : (Seq[(MysqlTable, Seq[TablePlan])], Seq[TablePlan]) = {
    val eligible = cfg.smallTableBytes > 0 && !cfg.continueOnError &&
      !cfg.exactRowIds && cfg.bucketBy.isEmpty &&
      theSink.isInstanceOf[ParquetSink]
    if (!eligible) return (Nil, tables)
    val groups = scala.collection.mutable.LinkedHashMap[
      (Seq[MysqlColumn], Seq[String], Seq[Seq[String]]),
      scala.collection.mutable.Buffer[(TablePlan, MysqlTable)]]()
    val singles = scala.collection.mutable.Buffer[TablePlan]()
    for (t <- tables) {
      val sz = t.dataFiles.map(_.size).sum
      val parsed: Option[MysqlTable] =
        if (sz <= 0 || sz > cfg.smallTableBytes) None
        else try {
          t.schemaFile.filterNot(_ => cfg.noSchema) match {
            case Some(sf) => Some(MysqlDdl.parseCreateTable(readFile(sf)))
            case None => cfg.schemaCatalog.get((t.db, t.table))
          }
        } catch { case scala.util.control.NonFatal(_) => None }
      parsed match {
        case Some(tb) =>
          groups.getOrElseUpdate((tb.columns, tb.primaryKey, tb.uniqueKeys),
            scala.collection.mutable.Buffer()) += ((t, tb))
        case None => singles += t
      }
    }
    // a group of one gains nothing from a batch job
    val (multi, lone) = groups.values.toSeq.partition(_.size >= 2)
    val batches = multi.flatMap(_.grouped(MaxBatchTables)
      .map(g => (g.head._2, g.map(_._1).toSeq)))
    val batched = batches.flatMap(_._2).map(t => (t.db, t.table)).toSet
    (batches, tables.filterNot(t => batched((t.db, t.table))))
  }

  /** One-job import of a batch of same-schema small tables:
    *
    *   1. per-table checkpoint gate (resume skips; any other prior state
    *      defers to the single path, which owns those contracts); fresh
    *      tables pin their job ts via the same create-exclusive CAS
    *   2. ONE write job: all tables' files parse through one shared align
    *      tree, each row picks up its table ordinal `_gk` and its
    *      PER-TABLE row-id base (each table's ids restart exactly as a
    *      standalone import would allocate) through the same O(1) path
    *      probe row-ids already use, and the staging write partitions by
    *      `_gk`
    *   3. ONE checksum job: a grouped aggregate over the staging readback
    *      computes every table's `t{tid}_…` checksum triple (byte-
    *      identical keys to the single path — the verify CLI re-scan
    *      still matches)
    *   4. driver-side publish: rename each `_gk=i` dir to the table's
    *      final location, then per-table commit-log/catalog/post steps
    *
    * Crash behavior: the staging dir name is deterministic for the table
    * set (a retry overwrites a crashed staging write); a crash mid-publish
    * leaves renamed tables "imported" (resume skips them) and the rest
    * "loaded" (deferred to the single path next run). Returns (reports,
    * deferred-to-single-path). */
  private def restoreBatch(schema: MysqlTable, batchAll: Seq[TablePlan])
      : (Seq[TableReport], Seq[TablePlan]) = {
    val p = theSink.asInstanceOf[ParquetSink]
    val results = scala.collection.mutable.Map[(String, String), TableReport]()
    val deferred = scala.collection.mutable.Buffer[TablePlan]()
    val run = scala.collection.mutable.Buffer[TablePlan]()
    for (t <- batchAll) {
      if (!cfg.checkpointEnabled) run += t
      else {
        val fp = fingerprint(t)
        log.read(t.db, t.table) match {
          case Some(st) if st.status == "imported" && st.planFingerprint == fp =>
            progress.foreach { pr =>
              pr.startTable(t.db, t.table); pr.finishTable(t.db, t.table)
            }
            results((t.db, t.table)) = TableReport(t.db, t.table, st.rows,
              st.checksum, st.totalBytes, st.totalKvs, resumedSkip = true)
          case Some(_) => deferred += t // failed / partial / stale state:
            // the single path owns those contracts (error-ignore gate,
            // pinned-ts adoption, fingerprint-change refresh)
          case None =>
            val winner = log.writeIfAbsent(TableState(t.db, t.table,
              "loaded", 0, 0, 0, 0, fp, cfg.jobTsMicros))
            if (winner.planFingerprint == fp &&
                winner.jobTsMicros == cfg.jobTsMicros) run += t
            else deferred += t // a concurrent instance owns the ts pin
        }
      }
    }
    if (run.nonEmpty) {
      run.foreach(t => progress.foreach(_.startTable(t.db, t.table)))
      val timing = sys.env.contains("GRAFT_TIMING")
      var tmk = System.nanoTime()
      def tmark(tag: String): Unit = {
        if (timing) System.err.println(
          f"[graft-timing] batch-$tag ${(System.nanoTime() - tmk) / 1e9}%.3f s")
        tmk = System.nanoTime()
      }
      try {
        val ordinals = run.toSeq.zipWithIndex
        // per-table bases: capacityFor sz+1 matches the single path, so
        // synthesized row-ids / auto-inc values are identical either way
        val baseEntries = ordinals.flatMap { case (t, _) =>
          RowIdAllocator.fileBases(
            t.dataFiles.map(f => (f.path, f.size)), sz => sz + 1)
        }
        val ordEntries = ordinals.flatMap { case (t, i) =>
          t.dataFiles.map(f => (f.path, i.toLong))
        }
        val aligned = loadAlignedFiles(run.toSeq.flatMap(_.dataFiles),
          schema, cfg.jobTsMicros)
        val withVals = RowIdAllocator.pathValue(
          RowIdAllocator.pathValue(aligned, "_src_file", baseEntries,
            "_g_rid_base"),
          "_src_file", ordEntries, "_gk")
        val withId0 = withVals
          .withColumn("_row_id", col("_g_rid_base") + col("_row_idx") + 1)
        val withId = withAutoIncFill(withColumnRowIdOverride(withId0), schema)
        // TASK COUNT = one wave of the cluster, never one-task-per-file
        // (r17 ingest_many profile): a 64-tiny-table batch ran as 64
        // one-file tasks in BOTH the write and the checksum job — two
        // scheduling waves of per-task parquet-writer init for 0.9 MiB.
        // Coalescing all the way to bytes-proportional (one task) is
        // WORSE: the writer inits serialize (~2 s measured). The sweet
        // spot is min(files, one wave of cores): writer inits stay
        // parallel, scheduling stays one wave, and a full-cap batch
        // (256 × 4 MiB) still spreads. coalesce is shuffle-free; the
        // dynamic-partition write sorts by _gk within each task, so a
        // task writing several tables streams per-dir writers
        // sequentially, never an open-writer explosion.
        val targetTasks = math.max(1, spark.sparkContext.defaultParallelism)
        val finalDf = withId.select(
          (schema.columns.map(c => col(c.name)) :+ col("_row_id") :+
            col("_gk").cast("int").as("_gk")): _*)
          .coalesce(targetTasks)
        val batchName = f"_graft_batch_${Crc64.checksum(
          run.map(t => s"${t.db}.${t.table}").mkString("|")
            .getBytes("UTF-8"))}%016x"
        gate() // cancellation points: before the write job and before
               // publish; a cancel DURING a job aborts via job-group cancel
        tmark("plan")
        // one file per task, exactly like the single path's write — a
        // forced repartition measured SLOWER (the shuffle + one task
        // serializing 64 parquet-writer inits beats nothing). Persisted so
        // the checksum job below folds the cached rows instead of
        // re-running the parse; bounded by MaxBatchTables × smallTableBytes
        // (≤1 GiB at defaults), spills if an executor is tight.
        finalDf.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val stagingDir = p.writeBatch(finalDf, batchName, "_gk")
        tmark("write")
        val fs = new org.apache.hadoop.fs.Path(stagingDir)
          .getFileSystem(hconf)
        // per-table checksums in one grouped aggregate over the SAME
        // pre-write lineage the write job ran (the observeChecksum=true
        // strategy, grouped): re-running the tiny parse beats re-opening
        // every per-table parquet file the write just closed — the
        // independent sink-side re-scan remains the verify CLI's job (A3)
        import spark.implicits._
        val tidDf = broadcast(ordinals.map { case (t, i) =>
          (i, ImportPipeline.tableId(t.db, t.table))
        }.toDF("_gk", "_g_tid"))
        val rep = KvEncode.groupedChecksum(finalDf.join(tidDf, "_gk"),
            schema, col("_g_tid"), "_row_id", col("_gk"))
          .collect().map { r =>
            r.getInt(r.fieldIndex("_g_grp")) ->
              ((r.getLong(r.fieldIndex("rows")),
                r.getLong(r.fieldIndex("data_checksum")),
                r.getLong(r.fieldIndex("data_bytes")),
                r.getLong(r.fieldIndex("data_kvs"))))
          }.toMap
        finalDf.unpersist(blocking = false)
        tmark("checksum")
        gate()
        for ((t, i) <- ordinals) {
          val part = new org.apache.hadoop.fs.Path(stagingDir, s"_gk=$i")
          rep.get(i) match {
            case Some((rows, dcs, dbytes, dkvs)) if fs.exists(part) =>
              val dest = new org.apache.hadoop.fs.Path(
                p.tablePath(t.db, t.table))
              fs.delete(dest, true)
              fs.mkdirs(dest.getParent)
              if (!fs.rename(part, dest))
                throw new java.io.IOException(
                  s"batch publish rename failed: $part -> $dest")
              if (cfg.checkpointEnabled)
                log.write(TableState(t.db, t.table, "imported", rows, dcs,
                  dbytes, dkvs, fingerprint(t), cfg.jobTsMicros))
              if (cfg.registerInCatalog && cfg.bucketBy.isEmpty) {
                spark.sql(s"CREATE DATABASE IF NOT EXISTS `${t.db}`")
                spark.sql(MysqlDdl.toSparkDdl(t.db,
                  schema.copy(name = t.table), dest.toString))
              }
              postCompact(t)
              postAnalyze(t)
              progress.foreach(_.finishTable(t.db, t.table))
              results((t.db, t.table)) = TableReport(t.db, t.table, rows,
                dcs, dbytes, dkvs, resumedSkip = false)
            case _ =>
              // zero parsed rows leaves no partition dir — the single path
              // owns the empty-table layout; clear the loaded marker so it
              // starts fresh there
              if (cfg.checkpointEnabled) log.remove(t.db, t.table)
              deferred += t
          }
        }
        fs.delete(new org.apache.hadoop.fs.Path(stagingDir), true)
        tmark("publish")
      } catch {
        case e: Throwable =>
          run.foreach(t => progress.foreach(_.failTable(t.db, t.table,
            if (e.isInstanceOf[InterruptedException]) "canceled"
            else String.valueOf(e.getMessage))))
          throw e // batching only runs in fail-fast mode — propagate
      }
    }
    (batchAll.flatMap(t => results.get((t.db, t.table))), deferred.toSeq)
  }

  def restoreTable(t: TablePlan): TableReport = {
    val fp = fingerprint(t)
    if (cfg.checkpointEnabled) {
      log.read(t.db, t.table) match {
        case Some(st) if st.status == "imported" && st.planFingerprint == fp =>
          // resume: already imported with the same inputs — skip (K6)
          return TableReport(t.db, t.table, st.rows, st.checksum,
            st.totalBytes, st.totalKvs, resumedSkip = true)
        case Some(st) if st.status == "failed" && st.planFingerprint == fp =>
          // the reference refuses to run over a failed checkpoint until the
          // operator decides (restore.go errorSummaries → ctl): silently
          // re-running can double-apply a non-idempotent sink. Changed
          // inputs (new fingerprint) mean a repaired source — those import
          // fresh below.
          throw new IllegalStateException(
            s"table ${t.db}.${t.table} failed in a previous run; clear it " +
              "with checkpoint-error-ignore (keep data, resume from " +
              "committed chunks) or checkpoint-destroy (drop partial " +
              "output and restart)")
        case _ => ()
      }
    }
    // Pinned job timestamp SURVIVES resume (reference
    // tests/checkpoint_timestamp: COUNT(DISTINCT ts) must stay 1 across
    // crash/retry attempts): a crashed import's remaining chunks must not
    // fill CURRENT_TIMESTAMP defaults with a different value than the
    // chunks already committed. A "loaded" marker written before any data
    // records this run's ts; a resume (crash, or failed → error-ignore,
    // which resets the state to "loaded" keeping its ts) reuses it.
    val effectiveTs: Long =
      if (!cfg.checkpointEnabled) cfg.jobTsMicros
      else log.read(t.db, t.table) match {
        case Some(st) if st.planFingerprint == fp && st.jobTsMicros != 0L =>
          st.jobTsMicros
        case prior if cfg.jobTsMicros != 0L =>
          // create-exclusive, not read-then-write: two concurrent
          // importer instances sharing one commit log must agree on ONE
          // pinned ts — whoever loses the atomic create adopts the
          // winner's state. A stale state (changed fingerprint = repaired
          // input) is removed first; the CAS then arbitrates the rewrite.
          prior.filter(_.planFingerprint != fp)
            .foreach(_ => log.remove(t.db, t.table))
          val winner = log.writeIfAbsent(TableState(t.db, t.table,
            "loaded", 0, 0, 0, 0, fp, cfg.jobTsMicros))
          if (winner.planFingerprint == fp && winner.jobTsMicros != 0L)
            winner.jobTsMicros
          else cfg.jobTsMicros
        case _ => cfg.jobTsMicros
      }
    val table = t.schemaFile.filterNot(_ => cfg.noSchema) match {
      case Some(sf) => MysqlDdl.parseCreateTable(readFile(sf))
      case None => cfg.schemaCatalog.getOrElse((t.db, t.table),
        sys.error(s"no schema for ${t.db}.${t.table}: provide a *-schema.sql " +
          "or a schemaCatalog entry (no-schema mode)"))
    }
    val chunkable = theSink match {
      case _: ParquetSink => true
      // REPLACE/IGNORE replay is only idempotent when the table has a
      // PRIMARY or UNIQUE key to collide on — a keyless table would
      // duplicate every row of a chunk that crashed between its write and
      // its state commit, exactly the window chunk resume exists for.
      // Keyless → table-level commits instead.
      case j: JdbcSink => j.idempotentReplay && table.hasReplayKey
      case _ => false
    }
    if (cfg.chunkCheckpoints && !cfg.exactRowIds && chunkable &&
        cfg.bucketBy.isEmpty)
      return restoreByChunks(t, table, fp, effectiveTs)
    // ONE data pass: parse→align→row-id→sink write, with row count +
    // checksum triple riding along as df.observe metrics (accumulator
    // aggregates — no extra scan, the reference likewise checksums inline
    // during delivery, restore.go:491). The independent sink-side re-scan
    // lives in the `verify` CLI (A3), whose job is exactly that.
    val aligned = loadAligned(t, table, effectiveTs)
    // _row_idx is a deterministic, per-file-increasing handle: dense row
    // index for SQL dumps, line byte offset for CSV. Estimated mode needs
    // capacity ≥ any handle value → size+1 covers both (gaps allowed, S8);
    // exact mode densifies via an ordering window (counting pass implied).
    val withId0 =
      if (cfg.exactRowIds)
        RowIdAllocator.fromOrdering(aligned, col("_src_file"), col("_row_idx"))
      else
        RowIdAllocator.fromFileSizes(aligned, "_src_file", "_row_idx",
          t.dataFiles.map(f => (f.path, f.size)),
          capacityFor = sz => sz + 1)
    // explicit `_tidb_rowid` from the file overrides the synthesized id
    // (reference restore.go:1363-1406, tests/tidb_rowid/)
    val withId = withAutoIncFill(withColumnRowIdOverride(withId0), table)
    val finalDf = withId.select(
      (table.columns.map(c => col(c.name)) :+ col("_row_id")): _*)
    // _row_id is persisted (the `_tidb_rowid` analog) so a sink-side
    // re-scan can recompute the identical checksum triple (A3).
    val obs = org.apache.spark.sql.Observation()
    // per-row crc/len helpers ride a codegen'd projection; the observe
    // aggregates (evaluated interpreted by CollectMetricsExec) fold only
    // precomputed longs, then the helpers are dropped before the sink
    val observed =
      if (cfg.observeChecksum) {
        val tid = ImportPipeline.tableId(t.db, t.table)
        val withKv = KvEncode.withObserveCols(finalDf, table, tid, "_row_id")
        val metrics = KvEncode.observeMetrics(table, tid, rowIdCol = "_row_id")
        withKv.observe(obs, metrics.head, metrics.tail: _*)
          .drop(KvEncode.observeHelperCols(table): _*)
      } else finalDf.observe(obs, count(lit(1)).as("rows"))
    val res = (cfg.bucketBy, theSink) match {
      case (Some((n, bcols)), p: ParquetSink) =>
        p.writeBucketed(observed, t.db, t.table, n, bcols)
      case (Some(_), other) => sys.error(
        s"bucketBy requires the parquet sink, got ${other.getClass.getSimpleName}")
      // a SQL target's column list must match the real table: `_row_id` is
      // graft's internal `_tidb_rowid` analog (persisted in parquet for
      // sink-side checksum re-scans) — the reference's tidb backend
      // likewise sends only the dump's own columns and lets the target
      // allocate row ids (lightning/backend/tidb.go:45-63)
      case (_, j: JdbcSink) => j.write(observed.drop("_row_id"), t.db, t.table)
      case _ => theSink.write(observed, t.db, t.table)
    }
    val m = obs.get
    def metric(k: String): Long = m.get(k) match {
      case Some(l: java.lang.Long) => l.longValue
      case Some(i: java.lang.Integer) => i.longValue
      case _ => 0L
    }
    val rows = if (res.rows >= 0) res.rows else metric("rows")
    val (dcs, dbytes, dkvs) =
      if (cfg.observeChecksum)
        (metric("data_checksum"), metric("data_bytes"), metric("data_kvs"))
      else {
        // columnar re-scan of the written output (codegen'd end-to-end)
        val checksumInput = res.outputPath match {
          case Some(path) => spark.read.parquet(path)
          case None => finalDf
        }
        val cs = KvEncode.checksumReport(checksumInput, table,
          tableId = ImportPipeline.tableId(t.db, t.table), rowIdCol = "_row_id")
          .collect().map(r => r.getString(0) ->
            (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
        cs.getOrElse("data", (0L, 0L, 0L))
      }
    if (cfg.checkpointEnabled)
      log.write(TableState(t.db, t.table, "imported", rows, dcs, dbytes,
        dkvs, fp, effectiveTs))
    // bucketed writes registered themselves via saveAsTable (the bucket
    // metadata only exists as a catalog property); replaying the DDL here
    // would strip it
    if (cfg.registerInCatalog && cfg.bucketBy.isEmpty)
      res.outputPath.foreach { path =>
        spark.sql(s"CREATE DATABASE IF NOT EXISTS `${t.db}`")
        spark.sql(MysqlDdl.toSparkDdl(t.db, table.copy(name = t.table), path))
      }
    postCompact(t)
    postAnalyze(t)
    TableReport(t.db, t.table, rows, dcs, dbytes, dkvs, resumedSkip = false)
  }

  /** Reference postProcess compact analog (restore.go:257/:984-991):
    * rewrite small chunk-append files into ≈target-sized ones. Before
    * ANALYZE so the stats see the final layout; skipped for bucketed
    * output (the bucket file layout IS the contract) and non-file sinks. */
  private def postCompact(t: TablePlan): Unit =
    cfg.compactTargetBytes.foreach { target =>
      theSink match {
        case p: ParquetSink if cfg.bucketBy.isEmpty =>
          p.compact(spark, t.db, t.table, target)
        case _ => ()
      }
    }

  /** Reference postProcess ordering: rebase → checksum → ANALYZE (restore
    * .go:998-1053). The import's own numbers (rows, checksum) ride the
    * write; this last step refreshes the TARGET's optimizer stats. */
  private def postAnalyze(t: TablePlan): Unit =
    if (cfg.postAnalyze) theSink match {
      case j: JdbcSink => j.analyze(t.db, t.table)
      case _: ParquetSink if cfg.registerInCatalog || cfg.bucketBy.nonEmpty =>
        spark.sql(s"ANALYZE TABLE `${t.db}`.`${t.table}` COMPUTE STATISTICS")
      case _ => () // no catalog entry to attach stats to (backend opts out,
                   // reference ShouldPostProcess==false path)
    }

  /** K6 chunk-granular restore: data files are grouped into ~chunkCommit
    * Bytes units; each group runs as its own parse→align→row-id→append
    * job and commits a ChunkState (rows + checksum triple) on success. A
    * rerun after a crash skips every committed group — chunk reuse is
    * gated on the whole table's input fingerprint. The table checksum is
    * the XOR/sum fold of the chunk triples (crc XOR is associative), so
    * the final TableState equals what a single-shot import would record
    * and the verify CLI re-scan still matches. */
  private def restoreByChunks(t: TablePlan, table: MysqlTable,
      fp: String, jobTs: Long): TableReport = {
    // chunk reuse is gated on input fingerprint AND group layout: a changed
    // chunkCommitBytes re-derives every chunkId, so it must invalidate the
    // committed states (else `done` stays nonEmpty, the output dir is kept,
    // and every re-derived chunk would append duplicates)
    val chunkFp = s"$fp+cb=${cfg.chunkCommitBytes}"
    val psinkOpt = theSink match {
      case p: ParquetSink => Some(p)
      case _ => None
    }
    val done = if (cfg.checkpointEnabled)
      log.readChunks(t.db, t.table).filter(_._2.tableFp == chunkFp)
    else Map.empty[String, ChunkState]
    psinkOpt.foreach { psink =>
      val outPath = new org.apache.hadoop.fs.Path(psink.tablePath(t.db, t.table))
      val ofs = outPath.getFileSystem(hconf)
      if (done.isEmpty) { // fresh import: clear stale output + chunk states
        if (cfg.checkpointEnabled) log.clearChunks(t.db, t.table)
        if (ofs.exists(outPath)) ofs.delete(outPath, true)
      } else if (ofs.exists(outPath)) {
        // resume reconciliation: any table-dir file not referenced by a
        // committed chunk state is output from a chunk that crashed between
        // its append job and its state write — delete it before re-running
        // that chunk, or the rows would be duplicated. Stale hidden staging
        // dirs are crashed attempts too.
        val referenced = done.values.flatMap(_.files).toSet
        ofs.listStatus(outPath).foreach { st =>
          val n = st.getPath.getName
          if (st.isDirectory && n.startsWith("_staging_"))
            ofs.delete(st.getPath, true)
          else if (st.isFile && n.startsWith("part-") && !referenced.contains(n))
            ofs.delete(st.getPath, false)
        }
      }
    }
    // group sorted files up to the commit-granularity byte target
    val groups = {
      val gs = scala.collection.mutable.ArrayBuffer.empty[Seq[SourceFile]]
      var cur = scala.collection.mutable.ArrayBuffer.empty[SourceFile]
      var bytes = 0L
      t.dataFiles.sortBy(_.path).foreach { f =>
        if (cur.nonEmpty && bytes + f.size > cfg.chunkCommitBytes) {
          gs += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty
          bytes = 0L
        }
        cur += f; bytes += f.size
      }
      if (cur.nonEmpty) gs += cur.toSeq
      gs.toSeq
    }
    val allSizes = t.dataFiles.map(f => (f.path, f.size))
    val timing = sys.env.contains("GRAFT_TIMING")
    def tmark(tag: String, t0: Long): Long = {
      if (timing) System.err.println(
        f"[graft-timing] $tag ${(System.nanoTime() - t0) / 1e9}%.3f s")
      System.nanoTime()
    }
    val states = groups.map { files =>
      val chunkId = s"${files.head.path}+${files.size}"
      val groupBytes = files.map(_.size).sum
      val state = done.getOrElse(chunkId, {
        gate()
        progress.foreach(_.startChunk(t.db, t.table, chunkId, groupBytes))
        val tp0 = System.nanoTime()
        val aligned = loadAlignedFiles(files, table, jobTs)
        val withId = withAutoIncFill(withColumnRowIdOverride(
          RowIdAllocator.fromFileSizes(aligned, "_src_file",
            "_row_idx", allSizes, capacityFor = sz => sz + 1,
            // bases stay global (disjoint across groups) but this group's
            // rows only reference its own files — the lookup shipped with
            // the tasks holds just those entries, so plan/task size is
            // bounded by chunkCommitBytes even at ~400k-shard tables
            restrictTo = Some(files.map(_.path)))), table)
        val finalDf = withId.select(
          (table.columns.map(c => col(c.name)) :+ col("_row_id")): _*)
        val obs = org.apache.spark.sql.Observation()
        val tid = ImportPipeline.tableId(t.db, t.table)
        val withKv = KvEncode.withObserveCols(finalDf, table, tid, "_row_id")
        val metrics = KvEncode.observeMetrics(table, tid, rowIdCol = "_row_id")
        val observed = withKv.observe(obs, metrics.head, metrics.tail: _*)
          .drop(KvEncode.observeHelperCols(table): _*)
        val tp1 = tmark("plan", tp0)
        val outFiles = psinkOpt match {
          case Some(psink) =>
            // staged write: the moved part-file names go into the state so
            // resume can reconcile orphans (crash-consistent, no dup rows)
            val tag = f"${graft.functions.Crc64.checksum(chunkId.getBytes("UTF-8"))}%016x"
            psink.writeChunkStaged(observed, t.db, t.table, tag)
          case None =>
            // JDBC path: rows land in the target DB; replay of this one
            // chunk after a crash is idempotent under REPLACE/IGNORE.
            // `_row_id` stays out of the statements — the target's real
            // column list doesn't have it (see the table-level write)
            theSink.write(observed.drop("_row_id"), t.db, t.table)
            Nil
        }
        val tp2 = tmark("write", tp1)
        val m = obs.get
        tmark("obs_get", tp2)
        def metric(k: String): Long = m.get(k) match {
          case Some(l: java.lang.Long) => l.longValue
          case Some(i: java.lang.Integer) => i.longValue
          case _ => 0L
        }
        val cs = ChunkState(t.db, t.table, chunkId, chunkFp, metric("rows"),
          metric("data_checksum"), metric("data_bytes"), metric("data_kvs"),
          outFiles)
        if (cfg.checkpointEnabled) log.writeChunk(cs)
        cs
      })
      // report committed AND resume-skipped groups — the bar must not
      // restart from zero when an import resumes
      progress.foreach(_.finishChunk(t.db, t.table, chunkId, groupBytes,
        state.rows))
      state
    }
    val rows = states.map(_.rows).sum
    val dcs = states.map(_.checksum).foldLeft(0L)(_ ^ _)
    val dbytes = states.map(_.totalBytes).sum
    val dkvs = states.map(_.totalKvs).sum
    if (cfg.checkpointEnabled)
      log.write(TableState(t.db, t.table, "imported", rows, dcs, dbytes,
        dkvs, fp, jobTs)) // the PINNED ts — the rows carry it, not cfg's
    if (cfg.registerInCatalog) psinkOpt.foreach { psink =>
      spark.sql(s"CREATE DATABASE IF NOT EXISTS `${t.db}`")
      spark.sql(MysqlDdl.toSparkDdl(t.db, table.copy(name = t.table),
        psink.tablePath(t.db, t.table)))
    }
    postCompact(t)
    postAnalyze(t)
    TableReport(t.db, t.table, rows, dcs, dbytes, dkvs, resumedSkip = false)
  }

  /** Explicit `_tidb_rowid` routing: when the aligned frame carries
    * `_explicit_rowid` (a file column list named the pseudo-column), it
    * overrides the synthesized allocation per row. */
  private def withColumnRowIdOverride(withId: DataFrame): DataFrame =
    if (withId.columns.contains("_explicit_rowid"))
      withId.withColumn("_row_id",
        coalesce(col("_explicit_rowid"), col("_row_id")))
    else withId

  /** P4 second half: AUTO_INCREMENT columns the source did not carry (or
    * carried as NULL — MySQL's "allocate for me") take the allocated row
    * id, the reference's AllocateAutoID routing (restore.go:1363-1406;
    * observable fixture tests/default-columns). Values present in the dump
    * win via the coalesce. */
  private def withAutoIncFill(withId: DataFrame, table: MysqlTable): DataFrame =
    table.columns.filter(_.autoIncrement).foldLeft(withId) { (d, mc) =>
      d.withColumn(mc.name,
        coalesce(col(mc.name), col("_row_id").cast(mc.sparkType)))
    }

  /** Parse + align one table's data files (CSV and SQL shards may mix when
    * routing merges source tables — both land in the declared schema). */
  private def loadAligned(t: TablePlan, table: MysqlTable,
      jobTs: Long): DataFrame =
    loadAlignedFiles(t.dataFiles, table, jobTs)

  private def loadAlignedFiles(dataFiles: Seq[SourceFile],
      table: MysqlTable, jobTs: Long): DataFrame = {
    val sqlFiles = dataFiles.filter(_.kind == FileKind.SqlData)
      .map(f => (f.path, f.size))
    val csvFiles = dataFiles.filter(_.kind == FileKind.CsvData).map(_.path)
    val parts = Seq.newBuilder[DataFrame]
    if (sqlFiles.nonEmpty) {
      val raw = SqlDumpSource.readChunkedSized(spark, sqlFiles,
        cfg.minChunkBytes, cfg.charset)
      // per-row statement-column alignment: mixed INSERT shapes (explicit
      // vs implicit lists, shard merges with different column orders) land
      // correctly; the common all-positional case stays a constant-index
      // projection. A statement list naming `_tidb_rowid` routes it to the
      // row handle (emitExplicitRowId).
      parts += SchemaAlign.fromArrayPerStatement(raw, col("vals"),
        col("stmt_cols"), table, cfg.sqlMode, jobTs,
        keep = Seq(col("src_file").as("_src_file"), col("row_idx").as("_row_idx")),
        kindsCol = Some(col("kinds")), valueCharset = cfg.charset,
        emitExplicitRowId = true)
    }
    if (csvFiles.nonEmpty) {
      // per-FILE headers (reference csv_parser.go:100-118 parses each
      // file's own header row): shards are grouped by their own column
      // list, and each group aligns with ITS permutation — shards whose
      // headers permute columns differently land correctly instead of
      // silently inheriting the first file's order. The header may carry
      // columns the table doesn't declare (notably `_tidb_rowid`), so the
      // parse width is the header's length, not the table's.
      val headerGroups: Seq[(Seq[String], Seq[String])] =
        if (cfg.csv.header)
          csvFiles.groupBy(f =>
              CsvSource.headerNames(spark, f, cfg.csv, table.columns.size))
            .toSeq.map { case (hdr, fs) => (hdr, fs.sorted) }
            .sortBy(_._2.head)
        else Seq((table.columns.map(_.name), csvFiles))
      headerGroups.foreach { case (fileCols, files) =>
        val ncols = fileCols.size
        if (cfg.csv.multiLine) {
          // quoted-newline quirk: whole-file univocity parse, one task per
          // file, with a dense deterministic (src_file, row_idx) from the
          // parser itself — no window, no monotonically_increasing_id
          val raw = CsvSource.readWholeFileIndexed(spark, files, cfg.csv, ncols)
          parts += SchemaAlign.fromColumns(raw, fileCols, table,
            cfg.sqlMode, jobTs,
            keep = Seq(col("src_file").as("_src_file"),
              col("row_idx").as("_row_idx")),
            valueCharset = cfg.csv.charset, emitExplicitRowId = true)
        } else {
          // default: splittable line-based read; the per-row handle is the
          // line's byte offset — deterministic under any split plan
          val raw = CsvSource.readIndexed(spark, files, cfg.csv, ncols)
          parts += SchemaAlign.fromColumns(raw, fileCols, table,
            cfg.sqlMode, jobTs,
            keep = Seq(col("src_file").as("_src_file"),
              col("row_off").as("_row_idx")),
            valueCharset = cfg.csv.charset, emitExplicitRowId = true)
        }
      }
    }
    parts.result().reduce(_ unionByName _)
  }

  def readFile(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val in = fs.open(p)
    val bytes = try in.readAllBytes() finally in.close()
    val cs = cfg.charset match {
      case a if a.equalsIgnoreCase("auto") => SqlDumpSource.detectCharset(bytes)
      case b if b.equalsIgnoreCase("binary") => "ISO-8859-1"
      case other => other
    }
    new String(bytes, java.nio.charset.Charset.forName(cs))
  }
}
