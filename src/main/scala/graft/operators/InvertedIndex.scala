package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Token-sharded inverted index: the SERVING layout for keyword search
  * over a 100 TB corpus. [[CorpusStats.bm25]] scores by scanning the
  * whole corpus per query — right for offline mining, wrong for
  * serving, where a query must touch data proportional to its TERMS,
  * not the corpus. The index holds one postings row per (token, doc)
  * with the term frequency and document length baked in, hash-sharded
  * BY TOKEN (up to 65536 shards via the portable wide hash; files
  * token-sorted so row-group stats prune within a shard) so a query
  * plans only its terms' shard directories (the
  * same dir-pruned discipline as the IVF export), and the corpus-level
  * constants (N, Σdl) ride a one-row `_global` sidecar so scoring
  * needs no second corpus pass. Conjunctive-AND retrieval with BM25
  * ranking then runs entirely on the probed postings: document
  * frequency per term IS the term's postings count, so the scorer's
  * statistics come from the very rows the probe already read.
  *
  * Scale shape: the build is one explode + one (token, doc) count —
  * the word-count shuffle; the query reads |terms| shards, broadcasts
  * a |terms|-row df table, and ends in a TakeOrdered — no global sort,
  * no corpus scan. Per-term weights are summed in FIXED term order
  * (each (doc, term) contributes exactly one posting), so scores are
  * bit-reproducible in any engine — the DuckDB gate hash-matches the
  * full-scan replay. */
object InvertedIndex {

  /** Postings of the corpus: one row per (token, document) with
    * `tf` (occurrences) and `dl` (the document's token count).
    * Tokenization is the engine's standard normalize-then-whitespace
    * kernel ([[Dedup.normalized]]/[[Dedup.tokensOf]]) — the same one
    * every corpus gate replays in DuckDB. With `withPositions`, each
    * posting also carries the token's sorted 0-based POSITIONS in the
    * document (`pos`, array<int>) — the Lucene positional-postings
    * layout that makes [[searchPhrase]] answerable from the index
    * alone (cost: one posexplode + the position arrays' bytes; leave
    * it off for boolean/BM25-only serving). */
  def buildPostings(df: DataFrame, textCol: String,
      idCol: String, withPositions: Boolean = false): DataFrame =
    buildPostingsObserved(df, textCol, idCol, withPositions, None)

  /** [[buildPostings]] with an optional corpus-stats observation: the
    * (n_docs, Σdl) constants the `_global` sidecar needs ride the
    * postings job's OWN materialization as `observe` metrics (r18) —
    * the index build reads and tokenizes the corpus ONCE where it
    * previously paid a second full scan just for two numbers. At
    * 100 TB that second pass IS a corpus read. */
  private def buildPostingsObserved(df: DataFrame, textCol: String,
      idCol: String, withPositions: Boolean,
      obs: Option[org.apache.spark.sql.Observation]): DataFrame = {
    val toks0 = df.filter(col(textCol).isNotNull)
      .select(col(idCol),
        Dedup.tokensOf(Dedup.normalized(col(textCol))).as("_toks"))
      .withColumn("dl", size(col("_toks")).cast("long"))
    val toks = obs.map(o => toks0.observe(o,
        count(lit(1)).as("n_docs"),
        coalesce(sum(col("dl")), lit(0L)).as("sum_dl")))
      .getOrElse(toks0)
    if (withPositions)
      toks.select(col(idCol), col("dl"),
          posexplode(col("_toks")).as(Seq("_p", "token")))
        .groupBy(col("token"), col(idCol), col("dl"))
        .agg(count(lit(1)).as("tf"),
          sort_array(collect_list(col("_p"))).as("pos"))
    else
      toks.select(col(idCol), col("dl"), explode(col("_toks")).as("token"))
        .groupBy(col("token"), col(idCol), col("dl"))
        .agg(count(lit(1)).as("tf"))
  }

  /** Write the index under `outDir`:
    * `shard=<s>/` postings parquet partitioned by a content-addressed
    * token hash — [[Export.shardOf]] (md5-nibble) up to 16 shards,
    * [[Export.shardOfWide]] (portable 32-bit md5 hash) up to 65536 —
    * both engine-portable AND driver-replayable, so [[searchAnd]] can
    * name a term's directory without touching the cluster. Postings are
    * TOKEN-SORTED within every file (`sortWithinPartitions` — a local
    * sort, no shuffle added), so the pushed `token IN (...)` probe
    * skips non-matching row groups via parquet min/max stats instead of
    * scanning the whole shard. A one-row `_global/` sidecar
    * (n_docs, sum_dl, n_shards, hash, id_col) holds the corpus
    * constants and the layout contract.
    *
    * 100 TB shape: at fleet shard counts (e.g. 4096) a two-term probe
    * plans 2/4096 of the postings, and within those shards row-group
    * stats prune to the terms' sorted runs — query I/O proportional to
    * the TERMS' postings, not the corpus. */
  def writeIndex(spark: SparkSession, df: DataFrame, textCol: String,
      idCol: String, outDir: String, nShards: Int,
      withPositions: Boolean = false): Unit = {
    require(nShards > 0 && nShards <= 65536,
      s"sharding addresses at most 65536 shards, got $nShards")
    // corpus constants ride the postings write as observe metrics (one
    // corpus scan+tokenize, not two — r18)
    val obs = org.apache.spark.sql.Observation()
    buildPostingsObserved(df, textCol, idCol, withPositions, Some(obs))
      .withColumn("shard", shardExpr(col("token"), nShards))
      .sortWithinPartitions("shard", "token")
      .write.mode("overwrite").partitionBy("shard").parquet(outDir)
    val m = obs.get
    writeGlobal(df.sparkSession, outDir, IndexMeta(
      m("n_docs").asInstanceOf[Long], m("sum_dl").asInstanceOf[Long],
      nShards, hashKindOf(nShards), idCol, withPositions))
  }

  /** Shard addressing by count: ≤ 16 keeps the original md5-nibble
    * kernel (existing indexes and their DuckDB replays are bit-stable),
    * above it the portable 32-bit hash. Recorded in `_global` so every
    * reader/maintainer uses the layout's own kernel. */
  private def hashKindOf(nShards: Int): String =
    if (nShards <= 16) "nibble" else "wide"

  private def shardExpr(tok: Column, nShards: Int): Column =
    if (nShards <= 16) Export.shardOf(tok, nShards)
    else Export.shardOfWide(tok, nShards)

  /** The `_global` sidecar row: corpus constants + layout contract. A
    * pre-`hash` legacy sidecar is always a nibble layout and a
    * pre-`positions` one never carries positions (both columns shipped
    * with their features). */
  private[operators] final case class IndexMeta(nDocs: Long, sumDl: Long,
    nShards: Int, hash: String, idCol: String, positions: Boolean)

  private def readGlobal(spark: SparkSession, indexDir: String)
      : IndexMeta = {
    val g = spark.read.parquet(s"$indexDir/_global").collect()(0)
    val kind =
      if (g.schema.fieldNames.contains("hash")) g.getAs[String]("hash")
      else "nibble"
    val pos = g.schema.fieldNames.contains("positions") &&
      g.getAs[Boolean]("positions")
    IndexMeta(g.getAs[Long]("n_docs"), g.getAs[Long]("sum_dl"),
      g.getAs[Int]("n_shards"), kind, g.getAs[String]("id_col"), pos)
  }

  private def writeGlobal(spark: SparkSession, indexDir: String,
      m: IndexMeta): Unit =
    spark.range(1)
      .select(lit(m.nDocs).as("n_docs"), lit(m.sumDl).as("sum_dl"),
        lit(m.nShards).as("n_shards"), lit(m.hash).as("hash"),
        lit(m.idCol).as("id_col"), lit(m.positions).as("positions"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$indexDir/_global")

  /** INCREMENTAL index maintenance: append NEW documents' postings to
    * an existing index without touching what's already there. The
    * shard layout is content-addressed by token, so a new doc's
    * postings land in exactly the shard directories a query would
    * probe, and the `_global` corpus constants are bumped by the
    * batch's (count, Σdl) — [[searchAnd]] then serves the union corpus
    * with full-corpus statistics, bit-identical to a from-scratch
    * rebuild (df per term is still the term's postings count; the
    * gate hash-matches an even/odd split-then-append against the
    * full-corpus oracle). Contract: `df`'s ids must be NEW — an id
    * already indexed (or previously tombstoned by
    * [[deleteFromIndex]]) would double-count tf/df; rebuild to
    * re-add. Scale shape: work is proportional to the BATCH (one
    * explode + one (token, doc) count over the new docs), never the
    * indexed corpus — the property that makes a 100 TB serving index
    * maintainable at all. Not transactional: a crash between the
    * postings append and the `_global` rewrite leaves stale corpus
    * constants (rebuildable serving layout, same contract as
    * [[Export.writeShards]]); the lake manifests are the
    * transactional tier. */
  def appendToIndex(spark: SparkSession, df: DataFrame, textCol: String,
      indexDir: String): Unit = {
    val m = readGlobal(spark, indexDir)
    // the layout contract rides _global: an append into a positional
    // index carries positions too, so searchPhrase keeps serving. The
    // batch's (count, Σdl) ride the postings append as observe metrics
    // — one batch scan+tokenize, not two (r18)
    val obs = org.apache.spark.sql.Observation()
    buildPostingsObserved(df, textCol, m.idCol, m.positions, Some(obs))
      .withColumn("shard",
        if (m.hash == "wide") Export.shardOfWide(col("token"), m.nShards)
        else Export.shardOf(col("token"), m.nShards))
      .sortWithinPartitions("shard", "token")
      .write.mode("append").partitionBy("shard").parquet(indexDir)
    val s = obs.get
    writeGlobal(spark, indexDir, m.copy(
      nDocs = m.nDocs + s("n_docs").asInstanceOf[Long],
      sumDl = m.sumDl + s("sum_dl").asInstanceOf[Long]))
  }

  /** Tombstone DELETE for the serving index — the merge-on-read
    * discipline ([[Export.deleteWhereMoR]]) mirrored onto the postings
    * layout: the doc ids land in a `_deletes/` sidecar (postings files
    * are never rewritten), and [[searchAnd]] anti-joins the broadcast
    * tombstone set before computing df, so every statistic — document
    * frequency, N, Σdl — reflects the post-delete corpus exactly.
    * `_global` is adjusted here (count and Σdl of the docs actually
    * found, read from the dl already baked into their postings), so a
    * delete of an unknown id is a no-op and re-deleting an id cannot
    * double-subtract (already-tombstoned ids are excluded from the
    * adjustment scan). The stats scan reads the full postings ONCE at
    * delete time — maintenance cost, not query cost; queries still
    * probe only their terms' shards. */
  def deleteFromIndex(spark: SparkSession, indexDir: String,
      ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "delete needs at least one doc id")
    val m = readGlobal(spark, indexDir)
    val (fs, _) = Export.fsRoot(indexDir)
    val delDir = s"$indexDir/_deletes"
    val existing =
      if (fs.exists(new org.apache.hadoop.fs.Path(delDir)))
        spark.read.parquet(delDir).collect().map(_.getLong(0)).toSet
      else Set.empty[Long]
    val fresh = ids.distinct.filterNot(existing)
    if (fresh.isEmpty) return
    // per-doc dl from the postings themselves (dl rides every posting
    // row); bounded collect — one row per deleted doc actually indexed
    val found = spark.read.parquet(indexDir)
      .filter(col(m.idCol).isInCollection(fresh))
      .groupBy(col(m.idCol))
      .agg(first(col("dl")).as("_dl"))
      .collect()
    import spark.implicits._
    fresh.toDF(m.idCol)
      .coalesce(1)
      .write.mode("append").parquet(delDir)
    writeGlobal(spark, indexDir, m.copy(
      nDocs = m.nDocs - found.length,
      sumDl = m.sumDl - found.map(_.getAs[Long]("_dl")).sum))
  }

  /** TOMBSTONE COMPACTION: fold the `_deletes/` sidecar into rewritten
    * postings — the maintenance verb that keeps the serving anti-join
    * set from growing forever. One full postings read (anti-joined on
    * the broadcast tombstones), one token-sorted partitioned rewrite
    * into a staging dir, then a directory swap and the tombstone dir is
    * dropped. `_global` is NOT touched: [[deleteFromIndex]] already
    * adjusted N/Σdl at delete time, and folding the tombstones changes
    * which bytes hold the corpus, not the corpus. Maintenance cost
    * (corpus-proportional, like any compaction); queries before/after
    * serve the identical ranking — idempotent, a second run is a plain
    * layout rewrite. The staging dir is underscore-prefixed, so readers
    * racing the swap never plan half-written files (same serving-layout
    * contract as [[Export.writeShards]]: the lake manifests are the
    * transactional tier). */
  def compactIndex(spark: SparkSession, indexDir: String): Unit = {
    val m = readGlobal(spark, indexDir)
    val (fs, root) = Export.fsRoot(indexDir)
    val delPath = new org.apache.hadoop.fs.Path(root, "_deletes")
    val live0 = spark.read.parquet(indexDir)
    val live =
      if (fs.exists(delPath))
        live0.join(broadcast(spark.read.parquet(delPath.toString)),
          Seq(m.idCol), "left_anti")
      else live0
    val staging = new org.apache.hadoop.fs.Path(root, "_compact_staging")
    fs.delete(staging, true)
    // the read-back frame carries `shard` as the partition column —
    // reuse it verbatim (same hash, same layout) rather than re-hashing;
    // positional postings carry their pos arrays through unchanged
    val kept = Seq(col("token"), col(m.idCol), col("dl"), col("tf")) ++
      (if (m.positions) Seq(col("pos")) else Nil) :+ col("shard")
    live.select(kept: _*)
      .sortWithinPartitions("shard", "token")
      .write.partitionBy("shard").parquet(staging.toString)
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("shard="))
      .foreach(st => fs.delete(st.getPath, true))
    fs.listStatus(staging).toSeq
      .filter(_.getPath.getName.startsWith("shard="))
      .foreach(st => fs.rename(st.getPath,
        new org.apache.hadoop.fs.Path(root, st.getPath.getName)))
    fs.delete(staging, true)
    fs.delete(delPath, true)
  }

  /** Driver-side replay of the layout's shard kernel for a literal
    * token — [[Export.shardOf]] (ascii of the first md5-hex nibble) or
    * [[Export.shardOfWide]] ([[Sketches.hash32]]: first 8 md5-hex chars
    * as a 32-bit value) — lets the query planner name the shard
    * directories without a Spark job. */
  private[operators] def shardOfToken(tok: String, nShards: Int,
      hash: String = "nibble"): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    if (hash == "wide")
      (java.lang.Long.parseLong(hex.substring(0, 8), 16) % nShards).toInt
    else hex.charAt(0).toInt % nShards
  }

  /** Conjunctive-AND keyword search with BM25 ranking, answered FROM
    * THE INDEX: plans only the query terms' shard directories, keeps
    * only documents containing EVERY term, and scores with the same
    * rational-idf BM25 as [[CorpusStats.bm25]] (`lnIdf = false` keeps
    * every step +,×,÷ over integer-derived doubles — engine-exact; pass
    * `lnIdf = true` for the real-use log damping). Per-term weights land
    * in fixed columns (one posting per (doc, term)) and sum in term
    * order, so scores match the full-scan replay bit-for-bit. Returns
    * (idCol, bm25) top-`k`, ties broken by id. A term whose shard
    * directory doesn't exist (never-indexed hash bucket) short-circuits
    * to the typed empty result — no corpus I/O at all. */
  def searchAnd(spark: SparkSession, indexDir: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      lnIdf: Boolean = false): DataFrame =
    search(spark, indexDir, terms, k, k1, b, lnIdf, requireAll = true)

  /** DISJUNCTIVE (OR) retrieval — the default web-search shape: any
    * document containing AT LEAST ONE query term is a candidate, ranked
    * by the sum of its present terms' BM25 weights (an absent term
    * contributes exactly 0, the same value the full-scan scorer's
    * tf=0 numerator yields — so OR scores stay bit-identical to the
    * replay). Same I/O shape as [[searchAnd]]: only the terms' shard
    * dirs are planned. */
  def searchOr(spark: SparkSession, indexDir: String, terms: Seq[String],
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      lnIdf: Boolean = false): DataFrame =
    search(spark, indexDir, terms, k, k1, b, lnIdf, requireAll = false)

  /** EXACT-PHRASE search — the second query every search user types:
    * documents whose normalized token stream contains `terms`
    * CONSECUTIVELY, ranked by the same BM25 as [[searchAnd]] (phrase
    * containment gates candidacy; scoring stays the per-term scorer,
    * bit-identical to the full-scan replay). Needs a POSITIONAL index
    * (`writeIndex(..., withPositions = true)`) — refused loudly on a
    * positions-less layout. I/O shape is exactly the AND probe: only
    * the phrase terms' shard dirs are planned, the adjacency check
    * (`exists(pos_0, p -> pos_i contains p+i ∀i)`) runs on the probed
    * postings' position arrays — no document text is ever re-read. */
  def searchPhrase(spark: SparkSession, indexDir: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75,
      lnIdf: Boolean = false): DataFrame = {
    require(terms.size >= 2,
      "a phrase needs at least two terms (use searchAnd for one)")
    search(spark, indexDir, terms, k, k1, b, lnIdf, requireAll = true,
      phrase = Some(terms))
  }

  /** ORDERED-PROXIMITY search (the `NEAR/w` query): documents where
    * the terms occur IN ORDER with the whole chain spanning at most
    * `window` token positions (first→last), ranked by the same BM25 as
    * [[searchAnd]]. `window = terms.size - 1` degenerates to the exact
    * phrase. Same positional-index contract and terms-only shard I/O
    * as [[searchPhrase]]; the chain check runs as nested
    * higher-order-function predicates over the probed postings'
    * position arrays — codegen-friendly, no document text re-read. */
  def searchNear(spark: SparkSession, indexDir: String,
      terms: Seq[String], window: Int, k: Int, k1: Double = 1.2,
      b: Double = 0.75, lnIdf: Boolean = false): DataFrame = {
    require(terms.size >= 2,
      "proximity needs at least two terms (use searchAnd for one)")
    require(window >= terms.size - 1,
      s"window $window cannot fit ${terms.size} ordered terms " +
        s"(minimum ${terms.size - 1})")
    search(spark, indexDir, terms, k, k1, b, lnIdf, requireAll = true,
      phrase = Some(terms), slop = Some(window))
  }

  private def search(spark: SparkSession, indexDir: String,
      terms: Seq[String], k: Int, k1: Double, b: Double,
      lnIdf: Boolean, requireAll: Boolean,
      phrase: Option[Seq[String]] = None,
      slop: Option[Int] = None): DataFrame = {
    require(terms.nonEmpty, "search needs at least one term")
    require(k > 0, s"k must be positive, got $k")
    val m = readGlobal(spark, indexDir)
    phrase.foreach(_ => require(m.positions,
      s"$indexDir carries no token positions - rebuild with " +
        "writeIndex(..., withPositions = true) to serve phrase queries"))
    val n = m.nDocs.toDouble
    val avgdl = m.sumDl.toDouble / n
    val qTerms = terms.distinct
    val dirs = qTerms.map(t => shardOfToken(t, m.nShards, m.hash))
      .distinct.map(s => s"$indexDir/shard=$s")
    val (fs, _) = Export.fsRoot(indexDir)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(m.idCol,
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bm25",
          org.apache.spark.sql.types.DoubleType))))
    // AND: any missing term shard empties the conjunction outright.
    // OR: drop the missing terms' dirs and keep serving the rest.
    val liveDirs = dirs.filter(d =>
      fs.exists(new org.apache.hadoop.fs.Path(d)))
    if ((requireAll && liveDirs.size != dirs.size) || liveDirs.isEmpty)
      return empty
    val post0 = spark.read.parquet(liveDirs: _*)
      .filter(col("token").isin(qTerms: _*))
    // tombstoned docs ([[deleteFromIndex]]) drop out BEFORE df is
    // computed, so every served statistic reflects the live corpus
    val delDir = s"$indexDir/_deletes"
    val post =
      if (fs.exists(new org.apache.hadoop.fs.Path(delDir)))
        post0.join(broadcast(spark.read.parquet(delDir)),
          Seq(m.idCol), "left_anti")
      else post0
    // document frequency per term = that term's postings count; the
    // broadcast is |terms| rows
    val dfs = post.groupBy("token")
      .agg(count(lit(1)).cast("double").as("_df"))
    val w = {
      val idfOdds = (lit(n) - col("_df") + lit(0.5)) / (col("_df") + lit(0.5))
      val idf = if (lnIdf) log(lit(1.0) + idfOdds) else idfOdds
      idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
        (col("tf").cast("double") +
          lit(k1) * (lit(1.0 - b) +
            lit(b) * col("dl").cast("double") / lit(avgdl)))
    }
    // per-term lanes: the weight, and (phrase mode) the positions —
    // one posting per (doc, term), so first(ignoreNulls) is exact
    val aggs = qTerms.zipWithIndex.map { case (t, i) =>
      max(when(col("token") === lit(t), col("_w"))).as(s"_w_$i") } ++
      phrase.toSeq.flatMap(_ => qTerms.zipWithIndex.map { case (t, i) =>
        first(when(col("token") === lit(t), col("pos")),
          ignoreNulls = true).as(s"_p_$i") })
    val grouped = post.join(broadcast(dfs), "token")
      .withColumn("_w", w)
      .groupBy(col(m.idCol))
      .agg(aggs.head, aggs.tail: _*)
    // AND keeps only all-terms docs and sums plain lanes; OR admits any
    // posting-bearing doc and sums with an absent lane contributing
    // exactly 0.0 — the same value the full-scan scorer's tf=0
    // numerator yields, so both modes replay bit-identically
    val keepTerms =
      if (requireAll) qTerms.indices
        .map(i => col(s"_w_$i").isNotNull).reduce(_ && _)
      else lit(true) // every grouped doc has >=1 posting by construction
    // phrase adjacency: some start position p of the first term has
    // every following term at p+offset (lanes are keyed by DISTINCT
    // term, so a repeated phrase word checks its one lane at each of
    // its offsets). With `slop`, the relaxed ORDERED-CHAIN form: an
    // increasing position chain q_0 < q_1 < ... across the terms'
    // lanes with q_last - q_0 <= window — built as nested
    // higher-order-function predicates (depth = |terms|, tiny).
    val keep = (phrase, slop) match {
      case (Some(ph), None) =>
        val lane = ph.map(t => qTerms.indexOf(t))
        keepTerms && exists(col(s"_p_${lane.head}"), p =>
          lane.zipWithIndex.tail.map { case (l, off) =>
            array_contains(col(s"_p_$l"), p + off)
          }.reduce(_ && _))
      case (Some(ph), Some(w)) =>
        val lane = ph.map(t => qTerms.indexOf(t))
        def chain(i: Int, prev: Column, first: Column): Column =
          if (i == lane.length) lit(true)
          else exists(col(s"_p_${lane(i)}"), q =>
            q > prev && (q - first) <= lit(w) &&
              chain(i + 1, q, first))
        keepTerms && exists(col(s"_p_${lane.head}"), p =>
          chain(1, p, p))
      case _ => keepTerms
    }
    val score =
      if (requireAll) qTerms.indices.map(i => col(s"_w_$i")).reduce(_ + _)
      else qTerms.indices.map(i => coalesce(col(s"_w_$i"), lit(0.0)))
        .reduce(_ + _)
    grouped.filter(keep)
      .select(col(m.idCol), round(score, 6).as("bm25"))
      .orderBy(col("bm25").desc, col(m.idCol))
      .limit(k)
  }
}
