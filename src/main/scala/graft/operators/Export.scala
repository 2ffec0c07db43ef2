package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data export: the last mile of the curation pipeline. Curated
  * rows land as deterministic SHARDS — the unit downstream dataloaders
  * consume — plus a manifest that certifies what was written.
  *
  * Shard assignment is content-addressed (md5 of the id), not
  * round-robin: reruns and engines agree row-for-row, and adding rows
  * never reshuffles existing assignments' logic. The write is ONE
  * partitioned parquet write (`partitionBy(shard)`) — Spark lays each
  * shard out as its own directory, no per-shard loop, no driver-side
  * routing. The manifest is computed from the WRITTEN files (a read-back
  * scan), not from the input frame — it certifies the bytes on disk, the
  * thing a training job actually reads.
  *
  * 100 TB shape: assignment is a narrow projection; the write shuffles
  * nothing (partitionBy splits files within each task — add a
  * `repartition(shardCol)` upstream only when exactly one file per shard
  * matters more than the shuffle). The manifest pass is one
  * map-side-combined aggregate over the written data.
  */
object Export {

  /** Engine-portable shard id: first md5 hex nibble of the id (as a
    * decimal string) mod `nShards` — the same hash role the sequence
    * packer uses, reproducible in any SQL engine. */
  def shardOf(idCol: org.apache.spark.sql.Column, nShards: Int)
      : org.apache.spark.sql.Column =
    ascii(substring(md5(idCol.cast("string")), 1, 1)) % nShards

  /** Wide content-addressed shard id: the engine's portable 32-bit md5
    * hash ([[Sketches.hash32]]) mod `nShards` — addresses up to 65536
    * shards (the dataloader-fleet scale a 100 TB export actually needs;
    * the one-nibble [[shardOf]] tops out at 16). Modulo bias is
    * ≤ nShards/2^32 — immaterial — and the kernel is the same one every
    * census gate already replays in DuckDB. */
  def shardOfWide(idCol: org.apache.spark.sql.Column, nShards: Int)
      : org.apache.spark.sql.Column = {
    require(nShards > 0 && nShards <= 65536,
      s"wide sharding addresses at most 65536 shards, got $nShards")
    (Sketches.hash32(idCol) % nShards).cast("int")
  }

  private def shardManifest(spark: SparkSession, idCol: String,
      outDir: String): DataFrame =
    spark.read.parquet(outDir)
      .groupBy("shard")
      .agg(count(lit(1)).as("n_rows"),
        sum(col(idCol)).cast("long").as("id_sum"),
        min(col(idCol)).cast("long").as("id_min"),
        max(col(idCol)).cast("long").as("id_max"))
      .select(col("shard").cast("int").as("shard"), col("n_rows"),
        col("id_sum"), col("id_min"), col("id_max"))

  /** Write `df` as `nShards` content-addressed shards under `outDir`,
    * return the certifying manifest: (shard, n_rows, id_sum, id_min,
    * id_max) per shard, read back from the written parquet. */
  def writeShards(spark: SparkSession, df: DataFrame, idCol: String,
      nShards: Int, outDir: String): DataFrame = {
    require(nShards > 0 && nShards <= 16,
      s"one md5 nibble addresses at most 16 shards, got $nShards")
    df.withColumn("shard", shardOf(col(idCol), nShards))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    shardManifest(spark, idCol, outDir)
  }

  /** [[writeShards]] with the wide hash: the same one-write + read-back-
    * certified manifest, at fleet shard counts. */
  def writeShardsWide(spark: SparkSession, df: DataFrame, idCol: String,
      nShards: Int, outDir: String): DataFrame = {
    df.withColumn("shard", shardOfWide(col(idCol), nShards))
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    shardManifest(spark, idCol, outDir)
  }

  // ---------------------------------------------------------------- zone map

  /** Range-clustered layout + zone-map manifest: the data-layout half of
    * partition pruning. Rows are range-partitioned on `keyCol` (each
    * output file owns a contiguous, sorted key interval) and the returned
    * manifest records one `(file, key_min, key_max, n_rows)` row per
    * written file — the same file-level min/max metadata Iceberg/Delta
    * keep, computed here from the bytes READ BACK so it certifies what a
    * consumer will actually scan.
    *
    * 100 TB shape: one range exchange (sampled split points, no
    * hot-spotting on skewed keys beyond what range partitioning already
    * handles), sort within partitions is local. The manifest is file-level
    * metadata — ~400k rows for 100 TB of 256 MiB files — which is
    * driver-holdable by design; that is exactly the scale at which table
    * formats hold their manifests on the planning side. */
  def writeRangeLayout(spark: SparkSession, df: DataFrame, keyCol: String,
      nFiles: Int, outDir: String): DataFrame = {
    df.repartitionByRange(nFiles, col(keyCol))
      .sortWithinPartitions(keyCol)
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(keyCol)).cast("long").as("key_min"),
        max(col(keyCol)).cast("long").as("key_max"),
        count(lit(1)).as("n_rows"))
  }

  /** Manifest-driven pruned scan of a [[writeRangeLayout]] directory:
    * plan only the files whose `[key_min, key_max]` zone overlaps
    * `[lo, hi]`, then apply the exact predicate (pushed to the parquet
    * scan, so surviving files still skip non-matching row groups).
    * The zone map is an OPTIMIZATION, not a correctness gate: an
    * over-wide manifest reads extra files but never changes the result;
    * a manifest that lost a file loses rows — which is why the gate
    * hash-checks the query result against a full-scan oracle.
    *
    * The manifest collect is file-level metadata only (see
    * [[writeRangeLayout]]) — the planning-side work every lake format
    * does; row data never touches the driver. */
  def prunedRead(spark: SparkSession, manifest: DataFrame, keyCol: String,
      lo: Long, hi: Long): DataFrame = {
    val files = manifest
      .filter(col("key_max") >= lo && col("key_min") <= hi)
      .select("file").collect().map(_.getString(0)).sorted
    // empty overlap: scan one file so the schema survives; the exact
    // predicate below then yields the correct empty result
    val chosen =
      if (files.nonEmpty) files
      else manifest.select("file").orderBy("file").limit(1)
        .collect().map(_.getString(0))
    spark.read.parquet(chosen.toIndexedSeq: _*)
      .filter(col(keyCol).between(lo, hi))
  }

  // ----------------------------------------------------------------- z-order

  /** Spread the low 16 bits of `x` so bit i lands at position 2i —
    * the classic Morton magic-number cascade, expressed as codegen'd
    * Column bit ops (no UDF). */
  private def spread16(x: Column): Column = {
    var v = x.bitwiseAND(lit(0xFFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
    v = v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
    v
  }

  /** 32-bit Morton interleave of two 16-bit keys: bit i of `a` at 2i, of
    * `b` at 2i+1. Locality in EITHER key survives in the code, which is
    * what makes a Z-curve sort prune on both dimensions at once. */
  def morton(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Z-order layout + two-dimensional zone map: rows are range-clustered
    * on the Morton interleave of (`colA`, `colB`) — the Delta/Iceberg
    * `ZORDER BY (a, b)` shape — and the manifest records per-file min/max
    * of BOTH keys, read back from the written bytes. A 1-D range layout
    * ([[writeRangeLayout]]) prunes perfectly on its sort key and not at
    * all on any other; the Z-curve trades a little of each: files own
    * compact boxes in (a, b) space, so a selective box query skips files
    * on both predicates. Keys must fit 16 bits (pre-scale wider domains
    * to rank/bucket space first — the curve needs relative order, not raw
    * values).
    *
    * 100 TB shape: identical to [[writeRangeLayout]] — one range exchange
    * on the Morton code (sampled split points), local sorts, file-level
    * manifest (~400k rows for 100 TB of 256 MiB files, planning-side by
    * design). */
  def writeZorderLayout(spark: SparkSession, df: DataFrame, colA: String,
      colB: String, nFiles: Int, outDir: String): DataFrame = {
    df.withColumn("_z", morton(col(colA).cast("long"), col(colB).cast("long")))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(colA)).cast("long").as("a_min"),
        max(col(colA)).cast("long").as("a_max"),
        min(col(colB)).cast("long").as("b_min"),
        max(col(colB)).cast("long").as("b_max"),
        count(lit(1)).as("n_rows"))
  }

  /** Manifest-driven box query over a [[writeZorderLayout]] directory:
    * plan only files whose (a, b) zone intersects the query box, then
    * apply the exact predicates (pushed to the scan). Same contract as
    * [[prunedRead]]: the manifest is an accelerator — over-wide zones
    * cost reads, never rows. */
  def prunedRead2D(spark: SparkSession, manifest: DataFrame,
      colA: String, colB: String, aLo: Long, aHi: Long,
      bLo: Long, bHi: Long): DataFrame = {
    val files = manifest
      .filter(col("a_max") >= aLo && col("a_min") <= aHi &&
        col("b_max") >= bLo && col("b_min") <= bHi)
      .select("file").collect().map(_.getString(0)).sorted
    val chosen =
      if (files.nonEmpty) files
      else manifest.select("file").orderBy("file").limit(1)
        .collect().map(_.getString(0))
    spark.read.parquet(chosen.toIndexedSeq: _*)
      .filter(col(colA).between(aLo, aHi) && col(colB).between(bLo, bHi))
  }

  // --------------------------------------------------------------- bucketing

  /** Bucketed export: lay a table out pre-hashed on its join key
    * (`bucketBy` + in-bucket sort) so every FUTURE equi-join or
    * aggregation on that key compiles with zero Exchange below the join —
    * the answer to "we join these two corpora every day; why are we
    * re-shuffling 100 TB every day?". Registered through the session
    * catalog because bucket metadata lives there, with an explicit
    * `path` so the files are plain parquet any engine can read (the
    * bucketing is an optimization contract, not a format change).
    * Returns the catalog-backed frame whose scans carry the bucket
    * spec. */
  def writeBucketed(spark: SparkSession, df: DataFrame, keyCol: String,
      nBuckets: Int, db: String, table: String, path: String): DataFrame = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    df.write.bucketBy(nBuckets, keyCol).sortBy(keyCol)
      .option("path", path).mode("overwrite")
      .saveAsTable(s"$db.$table")
    spark.table(s"$db.$table")
  }

  // ------------------------------------------------- snapshot manifests
  //
  // All manifest/vacuum I/O goes through org.apache.hadoop.fs.FileSystem
  // resolved from the table path's URI — NOT java.io.File — so the lake
  // layer runs against whatever storage the 100 TB deployment actually
  // uses (HDFS, S3A, ...). Manifest commits are write-temp + rename: on
  // HDFS rename is atomic; on object stores it is the same
  // single-visibility point every manifest-committing table format relies
  // on. A manifest file is:
  //     #key=value            (zero or more metadata headers)
  //     <data file path>      (one per line, qualified URIs)
  // Metadata headers carry commit-level facts (e.g. the streaming sink's
  // exactly-once batch id); readers skip them.

  import org.apache.hadoop.fs.{FileSystem, Path}

  /** Hadoop conf of the active session (the one whose fs.* settings the
    * deployment configured), falling back to a default Configuration so
    * the version/vacuum helpers keep their session-free signatures. */
  private def hadoopConf: org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  private[graft] def fsRoot(outDir: String): (FileSystem, Path) = {
    val p = new Path(outDir)
    val fs = p.getFileSystem(hadoopConf)
    (fs, fs.makeQualified(p))
  }

  private val ManifestName = "_v(\\d+)\\.manifest".r

  private def manifestVersions(fs: FileSystem, root: Path): Seq[Int] =
    if (!fs.exists(root)) Nil
    else fs.listStatus(root).toSeq.map(_.getPath.getName).collect {
      case ManifestName(v) => v.toInt
    }.sorted

  private def manifestPath(root: Path, version: Int): Path =
    new Path(root, s"_v$version.manifest")

  private def readManifestRaw(fs: FileSystem, root: Path,
      version: Int): Seq[String] = {
    val in = fs.open(manifestPath(root, version))
    try scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().filter(_.nonEmpty).toList
    finally in.close()
  }

  // A data line is `<path>` or `<path>\t<key_min>\t<key_max>` — the
  // optional zone is per-file min/max of the table's cluster key, the
  // Iceberg/Delta column-stats idea carried INSIDE the snapshot manifest
  // so time travel and file pruning come from the same commit. Lines are
  // carried verbatim across appends; readers that don't prune just take
  // the path field, and a zoneless line is always read (pruning is an
  // accelerator, never a correctness gate).
  private def dataLines(lines: Seq[String]): Seq[String] =
    lines.filterNot(_.startsWith("#"))

  private def pathOf(line: String): String = line.split('\t').head

  /** A column name based on `base` guaranteed absent from `cols`. */
  private[graft] def freshName(base: String, cols: Seq[String]): String =
    Iterator.from(0)
      .map(i => if (i == 0) base else s"$base$i")
      .find(n => !cols.contains(n)).get

  private def zoneOf(line: String): Option[(Long, Long)] =
    line.split('\t') match {
      case Array(_, lo, hi) => Some((lo.toLong, hi.toLong))
      case _ => None
    }

  /** Commit `_v<version>.manifest` atomically: write a temp file, then
    * rename into place. The rename is the commit point — a reader either
    * sees the complete manifest or no manifest; a crash before the rename
    * leaves only a `_tmp.` file the next commit ignores. */
  private[graft] def commitManifest(fs: FileSystem, root: Path, version: Int,
      meta: Map[String, String], files: Seq[String]): Unit = {
    meta.foreach { case (k, v) =>
      require(!k.contains('=') && !(k + v).exists(c => c == '\n' || c == '\r'),
        s"manifest meta must be line-safe: $k=$v") }
    val tmp = new Path(root,
      s"_tmp._v$version.manifest.${java.util.UUID.randomUUID}")
    val out = fs.create(tmp, false)
    try out.write(
      (meta.toSeq.sortBy(_._1).map { case (k, v) => s"#$k=$v" } ++ files)
        .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    // loser-detection is two layers: on HDFS/object stores, rename onto
    // an existing destination FAILS (returns false) — the true atomic
    // guard; on a POSIX local FS, File.renameTo silently OVERWRITES, so
    // the exists() pre-check catches the race the rename can't. A local
    // FS is a dev/test surface; the deployment stores get the atomic
    // semantics.
    val dest = manifestPath(root, version)
    if (fs.exists(dest) || !fs.rename(tmp, dest)) {
      fs.delete(tmp, false)
      throw new IllegalStateException(
        s"concurrent commit: _v$version.manifest already exists under $root")
    }
  }

  /** Write the epoch's immutable data files and return (dir, qualified
    * paths sorted) — listed ONCE at commit time; readers never list.
    * The directory name carries a RANDOM suffix so two committers racing
    * to the same version can never write into the same directory: the
    * loser's mode("overwrite") would otherwise DELETE the winner's
    * already-committed files before the manifest-rename guard ever ran.
    * A losing/crashed attempt just orphans its unreferenced dir, which
    * the next vacuum reclaims. */
  private def writeEpoch(fs: FileSystem, root: Path, version: Int,
      df: DataFrame): (Path, Seq[String]) = {
    val epochDir = new Path(root,
      s"epoch=$version-${java.util.UUID.randomUUID.toString.take(8)}")
    df.write.mode("overwrite").parquet(epochDir.toString)
    (epochDir, fs.listStatus(epochDir).toSeq.map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(_.toString).sorted)
  }

  /** Append-only snapshot log — the Delta/Iceberg core mechanism in its
    * minimal honest form: data files are IMMUTABLE (each append writes a
    * fresh `epoch=N` directory), and a version is just a manifest listing
    * the files visible at that version (previous manifest + the new
    * epoch's files). Readers never list directories — they read exactly
    * the manifest's files — so concurrent appends can't tear a read and
    * old versions stay readable forever (time travel). Commit is one
    * atomic manifest rename. `meta` lands as `#key=value` headers on the
    * committed manifest ([[snapshotMeta]]). Returns the new version. */
  def appendSnapshot(spark: SparkSession, df: DataFrame, outDir: String,
      meta: Map[String, String] = Map.empty): Int = {
    val (fs, root) = fsRoot(outDir)
    fs.mkdirs(root)
    val prev = manifestVersions(fs, root).lastOption
    val version = prev.getOrElse(0) + 1
    val (_, fresh) = writeEpoch(fs, root, version, df)
    val carried = prev match {
      case Some(v) => dataLines(readManifestRaw(fs, root, v))
      case None => Nil
    }
    commitManifest(fs, root, version, withSchema(meta, df), carried ++ fresh)
    version
  }

  /** Commit a FULL-REPLACE snapshot: like [[appendSnapshot]] the epoch's
    * files are immutable and the commit is one atomic manifest rename,
    * but the new manifest lists ONLY the new epoch — the previous
    * version's rows are superseded, not extended. This is the
    * materialized-view / upsert-sink commit: each version is a complete
    * table state, and old versions remain time-travel-readable because
    * their epochs are never touched. Returns the new version. */
  def replaceSnapshot(spark: SparkSession, df: DataFrame, outDir: String,
      meta: Map[String, String] = Map.empty): Int = {
    val (fs, root) = fsRoot(outDir)
    fs.mkdirs(root)
    val version = manifestVersions(fs, root).lastOption.getOrElse(0) + 1
    val (_, fresh) = writeEpoch(fs, root, version, df)
    commitManifest(fs, root, version, withSchema(meta, df), fresh)
    version
  }

  /** Latest committed snapshot version, or 0 if none. */
  def latestSnapshotVersion(outDir: String): Int = {
    val (fs, root) = fsRoot(outDir)
    manifestVersions(fs, root).lastOption.getOrElse(0)
  }

  /** All committed versions (ascending) — vacuumed versions absent. */
  def snapshotVersions(outDir: String): Seq[Int] = {
    val (fs, root) = fsRoot(outDir)
    manifestVersions(fs, root)
  }

  /** The data-file paths a version's manifest references — planning-side
    * metadata (the ops/CLI surface reads this without a Spark session). */
  def snapshotFiles(outDir: String, version: Int): Seq[String] = {
    val (fs, root) = fsRoot(outDir)
    dataLines(readManifestRaw(fs, root, version)).map(pathOf)
  }

  /** One row per committed version: (version, n_files, caller meta) —
    * each manifest read ONCE (listing a thousand-version streaming table
    * with per-version file+meta pairs would otherwise pay two object-
    * store round trips per version). */
  def snapshotEntries(outDir: String)
      : Seq[(Int, Int, Map[String, String])] = {
    val (fs, root) = fsRoot(outDir)
    manifestVersions(fs, root).map { v =>
      val lines = readManifestRaw(fs, root, v)
      val meta = lines.filter(_.startsWith("#"))
        .map(_.drop(1).split("=", 2))
        .collect { case Array(k, x) => k -> x }.toMap - "schema"
      (v, dataLines(lines).size, meta)
    }
  }

  /** The `#key=value` metadata headers of a committed manifest — the
    * CALLER's metadata; the engine's reserved `schema` header (written
    * on every commit, see [[withSchema]]) is internal bookkeeping and
    * filtered out. */
  def snapshotMeta(outDir: String, version: Int): Map[String, String] = {
    val (fs, root) = fsRoot(outDir)
    snapshotMetaOf(fs, root, version) - "schema"
  }

  private def snapshotMetaOf(fs: FileSystem, root: Path,
      version: Int): Map[String, String] =
    readManifestRaw(fs, root, version)
      .filter(_.startsWith("#"))
      .map(_.drop(1).split("=", 2))
      .collect { case Array(k, v) => k -> v }
      .toMap

  /** Every commit records the table schema as a `#schema=` header (the
    * single-line StructType JSON), so a version with ZERO data files —
    * an empty DataFrame is a legal commit (e.g. an empty first
    * micro-batch) — still reads back as an empty, correctly-typed
    * table instead of an unreadable manifest. */
  private def withSchema(meta: Map[String, String],
      df: DataFrame): Map[String, String] = {
    require(!meta.contains("schema"), "'schema' is a reserved meta key")
    meta + ("schema" -> df.schema.json)
  }

  /** Newest `#batch=` header across ALL versions — NOT just the latest:
    * a maintenance commit (compaction carries only `compacted_from`)
    * interleaving with the streaming sink must not reset the
    * exactly-once guard to -1, or a replayed micro-batch would
    * double-apply. Batches commit in increasing order, so the newest
    * version carrying the header holds the highest applied id. */
  def lastAppliedBatch(outDir: String): Long = {
    val (fs, root) = fsRoot(outDir)
    manifestVersions(fs, root).reverseIterator
      .map(v => snapshotMetaOf(fs, root, v).get("batch"))
      .collectFirst { case Some(b) => b.toLong }
      .getOrElse(-1L)
  }

  private def emptyWithCommittedSchema(spark: SparkSession,
      fs: FileSystem, root: Path, version: Int): DataFrame = {
    val schemaJson = snapshotMetaOf(fs, root, version).getOrElse("schema",
      throw new IllegalStateException(
        s"version $version under $root has no data files and no " +
          "#schema= header (pre-schema-header commit?)"))
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.DataType.fromJson(schemaJson)
        .asInstanceOf[org.apache.spark.sql.types.StructType])
  }

  /** Retention: drop every snapshot version except the newest `keep`,
    * then delete any epoch file no surviving manifest references. Old
    * manifests go first, data files second — a reader holding a surviving
    * manifest can never observe a missing file, and a crash between the
    * two phases only leaves unreferenced files for the next vacuum (the
    * standard lake-retention ordering). Returns (versions dropped, files
    * deleted). */
  def vacuumSnapshots(outDir: String, keep: Int): (Int, Int) = {
    require(keep >= 1, s"must keep at least one version, got $keep")
    val (fs, root) = fsRoot(outDir)
    val versions = manifestVersions(fs, root)
    val dropped = versions.dropRight(keep)
    dropped.foreach(v => fs.delete(manifestPath(root, v), false))
    // normalize through makeQualified so manifests written with any
    // equivalent path spelling still protect their files
    val live: Set[String] = versions.takeRight(keep).flatMap { v =>
      dataLines(readManifestRaw(fs, root, v))
        .map(l => fs.makeQualified(new Path(pathOf(l))).toString)
    }.toSet
    // crashed commits leave `_tmp._v*` files (the rename never happened).
    // Only STALE ones are reclaimed (older than an hour): a fresh temp
    // file may be a commit IN FLIGHT — deleting it would make that
    // committer's rename fail with a spurious concurrent-commit error.
    val tmpHorizonMs = System.currentTimeMillis() - 60L * 60 * 1000
    if (fs.exists(root)) fs.listStatus(root).toSeq
      .filter(st => st.getPath.getName.startsWith("_tmp._v") &&
        st.getModificationTime < tmpHorizonMs)
      .foreach(st => fs.delete(st.getPath, false))
    var deleted = 0
    if (fs.exists(root)) fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("epoch="))
      .foreach { epoch =>
        fs.listStatus(epoch.getPath).toSeq.map(_.getPath)
          .filter(p => p.getName.endsWith(".parquet") &&
            !live(fs.makeQualified(p).toString))
          .foreach { p => if (fs.delete(p, false)) deleted += 1 }
        val left = fs.listStatus(epoch.getPath).toSeq.map(_.getPath.getName)
        if (!left.exists(_.endsWith(".parquet")))
          fs.delete(epoch.getPath, true)
      }
    (dropped.size, deleted)
  }

  /** Read the table AS OF `version`: exactly the manifest's files. */
  def readSnapshot(spark: SparkSession, outDir: String,
      version: Int): DataFrame = {
    val (fs, root) = fsRoot(outDir)
    val files = dataLines(readManifestRaw(fs, root, version))
      .map(pathOf).toIndexedSeq
    if (files.isEmpty) emptyWithCommittedSchema(spark, fs, root, version)
    else spark.read.parquet(files: _*)
  }

  /** [[appendSnapshot]] with the epoch CLUSTERED on an integral key and
    * per-file `[key_min, key_max]` zones recorded in the manifest's data
    * lines: one range exchange + local sorts (the writeRangeLayout
    * shape), then the read-back min/max per written file rides the same
    * atomic commit as the file list. This is how a table format carries
    * column stats in its manifests — [[readSnapshotPruned]] then answers
    * a range query on ANY version scanning only overlapping files, with
    * no separate zone-map table to keep in sync with the snapshot log. */
  def appendSnapshotClustered(spark: SparkSession, df: DataFrame,
      outDir: String, keyCol: String, nFiles: Int,
      meta: Map[String, String] = Map.empty): Int = {
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    val (fs, root) = fsRoot(outDir)
    fs.mkdirs(root)
    val prev = manifestVersions(fs, root).lastOption
    val version = prev.getOrElse(0) + 1
    val freshLines = writeClusteredEpoch(spark, fs, root, version, df,
      keyCol, nFiles)
    val carried = prev match {
      case Some(v) => dataLines(readManifestRaw(fs, root, v))
      case None => Nil
    }
    commitManifest(fs, root, version, withSchema(meta, df),
      carried ++ freshLines)
    version
  }

  /** Range-sort `df` on `keyCol` into `nFiles` files under
    * `epoch=<version>` and return one zoned manifest data line per
    * written file (read-back min/max, so the zone certifies the bytes). */
  private def writeClusteredEpoch(spark: SparkSession, fs: FileSystem,
      root: Path, version: Int, df: DataFrame, keyCol: String,
      nFiles: Int): Seq[String] = {
    val (epochDir, fresh) = writeEpoch(fs, root, version,
      df.repartitionByRange(nFiles, col(keyCol))
        .sortWithinPartitions(keyCol))
    val zones: Map[String, (Long, Long)] =
      spark.read.parquet(epochDir.toString)
        .groupBy(col("_metadata.file_path").as("file"))
        .agg(min(col(keyCol)).cast("long").as("lo"),
          max(col(keyCol)).cast("long").as("hi"))
        .collect()
        .map(r => fs.makeQualified(new Path(r.getString(0))).toString ->
          ((r.getLong(1), r.getLong(2)))).toMap
    fresh.map { f =>
      zones.get(fs.makeQualified(new Path(f)).toString) match {
        case Some((lo, hi)) => s"$f\t$lo\t$hi"
        case None => f // a file with zero rows carries no zone
      }
    }
  }

  /** Zone-pruned read of a snapshot version: plan only the files whose
    * manifest zone overlaps `[lo, hi]` (zoneless lines always read),
    * then apply the exact predicate — pushed to the parquet scan, so
    * surviving files still skip non-matching row groups. Same contract
    * as the layout zone maps: over-wide zones cost reads, never rows. */
  def readSnapshotPruned(spark: SparkSession, outDir: String,
      version: Int, keyCol: String, lo: Long, hi: Long): DataFrame = {
    val (fs, root) = fsRoot(outDir)
    val lines = dataLines(readManifestRaw(fs, root, version))
    val chosen = lines.filter(l => zoneOf(l) match {
      case Some((zlo, zhi)) => zhi >= lo && zlo <= hi
      case None => true
    }).map(pathOf)
    // empty overlap: keep one file so the schema survives; the exact
    // predicate then yields the correct empty result. A version with
    // zero data files reads back typed-empty via its #schema= header.
    val files =
      if (chosen.nonEmpty) chosen
      else lines.map(pathOf).sorted.take(1)
    (if (files.isEmpty) emptyWithCommittedSchema(spark, fs, root, version)
     else spark.read.parquet(files.toIndexedSeq: _*))
      .filter(col(keyCol).between(lo, hi))
  }

  /** Compaction (the Delta `OPTIMIZE` shape): rewrite the LATEST
    * version's rows into `nFiles` fresh files and commit them as a new
    * full-replace version. Pure layout surgery — the committed rows are
    * identical (the gate hash-matches through a compacted table), but a
    * streaming sink that commits one epoch per micro-batch accretes
    * thousands of small files, and at 100 TB the scan-planning and
    * per-file open cost of that layout is the classic lake pathology
    * compaction exists to fix. Old versions keep reading their original
    * epochs (immutability is never violated); the superseded small files
    * become unreferenced once retention drops the pre-compaction
    * versions, and [[vacuumSnapshots]] then reclaims them. Returns the
    * new version. */
  def compactSnapshot(spark: SparkSession, outDir: String,
      nFiles: Int = 1): Int = {
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    val latest = latestSnapshotVersion(outDir)
    require(latest > 0, s"nothing to compact under $outDir")
    val rows = readSnapshot(spark, outDir, latest).coalesce(nFiles)
    // version PINNED to latest+1, not re-derived at commit time:
    // delegating to replaceSnapshot would re-list the log and renumber
    // past any version committed since our read — silently dropping that
    // version's rows from the tip instead of failing the race. With the
    // pin, a concurrent commit makes commitManifest throw (the loser
    // detection), which is the correct outcome for maintenance racing a
    // live sink.
    val (fs, root) = fsRoot(outDir)
    val version = latest + 1
    val (_, fresh) = writeEpoch(fs, root, version, rows)
    commitManifest(fs, root, version,
      withSchema(Map("compacted_from" -> latest.toString), rows), fresh)
    version
  }

  /** Copy-on-write DELETE — the third leg of the lake DML triad
    * (append = INSERT, [[Merge.upsert]] through [[replaceSnapshot]] =
    * UPDATE): commit a new full-replace version holding every latest-
    * version row NOT matching `cond`. Deleted rows remain time-travel-
    * readable in prior versions until retention drops them — the
    * GDPR-style hard purge is this followed by [[vacuumSnapshots]].
    * One manifest-exact scan + one filtered write; no tombstone
    * bookkeeping on the read path. Returns the new version. */
  def deleteWhere(spark: SparkSession, outDir: String,
      cond: Column): Int = {
    val latest = latestSnapshotVersion(outDir)
    require(latest > 0, s"nothing to delete under $outDir")
    // SQL DELETE semantics: remove rows where the predicate is TRUE —
    // a NULL-evaluating predicate KEEPS the row. A plain filter(!cond)
    // would drop NULL rows too (filter discards NULL), silently purging
    // every row with a NULL in the predicate's columns.
    val keep = !coalesce(cond, lit(false))
    // version pinned for the same race-safety reason as compactSnapshot
    val rows = readSnapshot(spark, outDir, latest).filter(keep)
    val (fs, root) = fsRoot(outDir)
    val version = latest + 1
    val (_, fresh) = writeEpoch(fs, root, version, rows)
    commitManifest(fs, root, version,
      withSchema(Map("deleted_from" -> latest.toString), rows), fresh)
    version
  }

  /** CLUSTERED compaction (`OPTIMIZE ... ORDER BY` in one commit):
    * rewrite the latest version range-sorted on `keyCol` with per-file
    * zones on the new manifest — one maintenance pass both fixes the
    * small-files pathology AND (re)establishes the pruning layout that
    * epoch-at-a-time ingestion erodes (each streamed epoch is clustered
    * within itself; the TABLE's key ranges still overlap across epochs
    * until a clustered compaction re-sorts them). Same immutability
    * contract as [[compactSnapshot]]. */
  def compactSnapshotClustered(spark: SparkSession, outDir: String,
      keyCol: String, nFiles: Int): Int = {
    require(nFiles >= 1, s"nFiles must be positive, got $nFiles")
    val latest = latestSnapshotVersion(outDir)
    require(latest > 0, s"nothing to compact under $outDir")
    val (fs, root) = fsRoot(outDir)
    val version = latest + 1
    val rows = readSnapshot(spark, outDir, latest)
    val lines = writeClusteredEpoch(spark, fs, root, version,
      rows, keyCol, nFiles)
    commitManifest(fs, root, version,
      withSchema(Map("compacted_from" -> latest.toString), rows), lines)
    version
  }

  /** Change-data-feed between two committed versions: every row of
    * `vNew` not in `vOld` tagged `insert`, every row of `vOld` not in
    * `vNew` tagged `delete` (bag semantics — a row appearing twice in
    * the new version and once in the old yields one insert). This is the
    * question every incremental consumer asks a versioned table — "what
    * changed since the version I last read?" — answered from the two
    * manifests alone, no change log maintained on the write path.
    * 100 TB shape: two manifest-exact scans and one hash-partitioned
    * exceptAll per direction, the same key-shuffle cost as the upsert
    * that produced the change. */
  def snapshotDiff(spark: SparkSession, outDir: String,
      vOld: Int, vNew: Int): DataFrame = {
    val o = readSnapshot(spark, outDir, vOld)
    val n = readSnapshot(spark, outDir, vNew)
    n.exceptAll(o).withColumn("_change", lit("insert"))
      .unionByName(o.exceptAll(n).withColumn("_change", lit("delete")))
  }

  /** KEYED change-data-feed (the Delta CDF shape): classify each key of
    * a KEYED table (unique key per version — the upsert/matview output
    * contract) as `insert`, `delete`, or an update emitted as BOTH
    * `update_preimage` (old row) and `update_postimage` (new row). The
    * whole feed is ONE full-outer equi-join on the key and one explode —
    * the conditional row-fanout happens inside a single projection, so
    * the join is built once, not re-executed per change class. Null-safe
    * comparisons throughout: a null key matches a null key, and a column
    * flipping to/from NULL is a real update. */
  def snapshotDiffKeyed(spark: SparkSession, outDir: String,
      vOld: Int, vNew: Int, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "keyed diff needs at least one key column")
    val o = readSnapshot(spark, outDir, vOld)
    val n = readSnapshot(spark, outDir, vNew)
    val cols = o.columns.toSeq
    require(n.columns.toSeq.sorted == cols.sorted,
      s"schema mismatch between versions: ${cols.sorted} vs " +
        s"${n.columns.toSeq.sorted}")
    val cond = keyCols.map(k => col(s"o.$k") <=> col(s"n.$k"))
      .reduce(_ && _)
    // presence markers must not collide with real columns — a user table
    // legitimately named "_o"/"_n" would silently lose its values
    val mo = freshName("_o", cols)
    val mn = freshName("_n", cols)
    val j = o.withColumn(mo, lit(true)).as("o")
      .join(n.withColumn(mn, lit(true)).as("n"), cond, "full_outer")
    val changed = cols.filterNot(keyCols.contains)
      .map(c => !(col(s"o.$c") <=> col(s"n.$c")))
      .foldLeft(lit(false))(_ || _)
    val rowO = struct(cols.map(c => col(s"o.$c").as(c)): _*)
    val rowN = struct(cols.map(c => col(s"n.$c").as(c)): _*)
    def e(r: Column, tag: String) =
      struct(r.as("r"), lit(tag).as("c"))
    val entries =
      when(col(s"o.$mo").isNull, array(e(rowN, "insert")))
        .when(col(s"n.$mn").isNull, array(e(rowO, "delete")))
        .when(changed,
          array(e(rowO, "update_preimage"), e(rowN, "update_postimage")))
        .otherwise(array(e(rowO, "noop")))
    j.select(explode(entries).as("x"))
      .filter(col("x.c") =!= "noop")
      .select(col("x.r.*"), col("x.c").as("_change"))
  }
}
