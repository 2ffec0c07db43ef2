package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Export, Sketches}
import graft.util.Tables

/** Mergeable-sketch census gates + the Z-order layout gate.
  *
  * Each sketch gate builds the sketch SHARDED (four disjoint sub-corpora,
  * merged with the family's merge op) while DuckDB replays a single pass
  * over the whole input — so a hash match certifies the mergeability law
  * (merge(shards) ≡ single-pass) cross-engine, not just the estimator
  * arithmetic. That law is the whole point of a sketch at 100 TB: build
  * per shard, ship bytes, merge on the planning side.
  */
object Census {

  /** DuckDB: first-8-hex-chars-of-md5 → BIGINT via a Horner walk over
    * `strpos` nibble decodes (the repo's established portable hash). */
  private def hex8(e: String): String =
    (0 until 8).map(i =>
        s"(CAST(strpos('0123456789abcdef', substr($e, ${i + 1}, 1)) AS BIGINT) - 1)")
      .reduceLeft((a, n) => s"($a * 16 + $n)")

  // ------------------------------------------------------------------- HLL

  /** HLL distinct-orderkey census per returnflag, m=64: registers built
    * on four disjoint `l_orderkey % 4` shards and max-merged, then the
    * all-Long fixed-point summary, joined with the exact distinct count
    * (so the artifact itself shows the estimate against truth). DuckDB
    * replays hash → bucket/rho → registers → summary in one pass —
    * hash-match ⇔ shard-merge ≡ single-pass AND the estimator arithmetic
    * agrees bit-for-bit. */
  def q_hll_census(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"))
    val regs = (0 until 4).map { k =>
      Sketches.hllRegisters(li.filter(col("l_orderkey") % 4 === k),
        Seq("l_returnflag"), col("l_orderkey"), m = 64)
    }
    val merged = Sketches.hllMerge(regs, Seq("l_returnflag"))
    val summary = Sketches.hllSummary(merged, Seq("l_returnflag"), m = 64)
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("n_exact"))
    summary.join(exact, "l_returnflag").orderBy("l_returnflag")
  }

  val q_hll_census_sql: String = {
    val h = hex8("h8")
    s"""WITH h AS (
       |  SELECT l_returnflag, substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 8) AS h8
       |  FROM lineitem),
       |hb AS (SELECT l_returnflag, $h AS hv FROM h),
       |rr AS (SELECT l_returnflag, hv % 64 AS bucket,
       |  CASE WHEN hv // 64 = 0 THEN 27
       |       ELSE 27 - length(bin(hv // 64)) END AS rho FROM hb),
       |regs AS (SELECT l_returnflag, bucket, max(rho) AS r
       |  FROM rr GROUP BY 1, 2),
       |agg AS (SELECT l_returnflag, count(*) AS nz,
       |  sum(CAST(1 AS BIGINT) << (27 - r)) AS sp FROM regs GROUP BY 1),
       |ex AS (SELECT l_returnflag, count(DISTINCT l_orderkey) AS n_exact
       |  FROM lineitem GROUP BY 1)
       |SELECT agg.l_returnflag, 64 AS m,
       |  CAST(nz AS BIGINT) AS n_nonzero,
       |  CAST(64 - nz AS BIGINT) AS v_zero,
       |  CAST(sp + (64 - nz) * CAST(134217728 AS BIGINT) AS BIGINT) AS s_scaled,
       |  CAST((CAST(709 AS BIGINT) * 4096 * 134217728)
       |    // (CAST(1000 AS BIGINT) * (sp + (64 - nz) * CAST(134217728 AS BIGINT)))
       |    AS BIGINT) AS est_raw,
       |  CAST(n_exact AS BIGINT) AS n_exact
       |FROM agg JOIN ex USING (l_returnflag)
       |ORDER BY l_returnflag""".stripMargin
  }

  /** The HLL census driven through the §2.8 SQL SEAM: registers are
    * built by a plain `spark.sql` query over the `hll_bucket`/`hll_rho`
    * functions [[graft.GraftExtensions]] registers — the route a SQL
    * notebook user takes — then summarized by the same fixed-point
    * kernel. Hash-matching the single-pass DuckDB replay proves the SQL
    * functions compute exactly the DataFrame kernel's arithmetic (same
    * hash, same saturating rank), so the newest operator family is
    * reachable from SQL with certified-identical results. */
  def q_hll_sqlseam(s: SparkSession, dir: String): DataFrame = {
    graft.GraftExtensions.register(s)
    Tables.load(s, dir, "lineitem")
      .select(col("l_returnflag"), col("l_orderkey"))
      .createOrReplaceTempView("li_hll_seam")
    val regs = s.sql(
      """SELECT l_returnflag, hll_bucket(l_orderkey, 64) AS bucket,
        |  max(hll_rho(l_orderkey, 64)) AS r
        |FROM li_hll_seam
        |GROUP BY l_returnflag, hll_bucket(l_orderkey, 64)""".stripMargin)
    val summary = Sketches.hllSummary(regs, Seq("l_returnflag"), m = 64)
    val exact = s.table("li_hll_seam").groupBy("l_returnflag")
      .agg(countDistinct("l_orderkey").as("n_exact"))
    summary.join(exact, "l_returnflag").orderBy("l_returnflag")
  }

  /** Same replay as `q_hll_census`: the seam path and the DataFrame path
    * must both match the one DuckDB single-pass truth. */
  val q_hll_sqlseam_sql: String = q_hll_census_sql

  /** Streaming HLL census: distinct users per event_type with the
    * registers maintained as streaming state
    * ([[graft.streaming.EventStream.streamingHllRegisters]] — four
    * micro-batches, Complete-mode max aggregation). The merge-by-MAX law
    * makes the settled state EXACTLY the batch registers, so DuckDB's
    * single-pass replay hash-matches — the stream ≡ batch identity
    * certified cross-engine. */
  def q_stream_hll(s: SparkSession, dir: String): DataFrame = {
    val cp = new java.io.File("target/qtmp_stream",
      s"cp_hll_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    val regs = graft.streaming.EventStream.streamingHllRegisters(
      s, s"$dir/events.parquet", cp.getAbsolutePath,
      groupCol = "event_type", valueCol = "user_id", m = 64)
    val summary = Sketches.hllSummary(regs, Seq("event_type"), m = 64)
    val exact = Tables.load(s, dir, "events").groupBy("event_type")
      .agg(countDistinct("user_id").as("n_exact"))
    summary.join(exact, "event_type").orderBy("event_type")
  }

  private def deleteRec(f: java.io.File): Unit =
    graft.util.Dirs.deleteRec(f)

  val q_stream_hll_sql: String = {
    val h = hex8("h8")
    s"""WITH h AS (
       |  SELECT event_type, substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS h8
       |  FROM events),
       |hb AS (SELECT event_type, $h AS hv FROM h),
       |rr AS (SELECT event_type, hv % 64 AS bucket,
       |  CASE WHEN hv // 64 = 0 THEN 27
       |       ELSE 27 - length(bin(hv // 64)) END AS rho FROM hb),
       |regs AS (SELECT event_type, bucket, max(rho) AS r
       |  FROM rr GROUP BY 1, 2),
       |agg AS (SELECT event_type, count(*) AS nz,
       |  sum(CAST(1 AS BIGINT) << (27 - r)) AS sp FROM regs GROUP BY 1),
       |ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
       |  FROM events GROUP BY 1)
       |SELECT agg.event_type, 64 AS m,
       |  CAST(nz AS BIGINT) AS n_nonzero,
       |  CAST(64 - nz AS BIGINT) AS v_zero,
       |  CAST(sp + (64 - nz) * CAST(134217728 AS BIGINT) AS BIGINT) AS s_scaled,
       |  CAST((CAST(709 AS BIGINT) * 4096 * 134217728)
       |    // (CAST(1000 AS BIGINT) * (sp + (64 - nz) * CAST(134217728 AS BIGINT)))
       |    AS BIGINT) AS est_raw,
       |  CAST(n_exact AS BIGINT) AS n_exact
       |FROM agg JOIN ex USING (event_type)
       |ORDER BY event_type""".stripMargin
  }

  // ------------------------------------------------------------- count-min

  /** Count-min heavy hitters over the token stream, d=4 × w=256: sketches
    * built per `doc_id % 4` shard and sum-merged; candidates are the
    * distinct tokens (gate scale — at corpus scale the candidate stream
    * is per-partition top-k survivors); output the top 20 by CMS estimate
    * with exact counts alongside (est ≥ n_exact always — the sketch only
    * overcounts; `SketchesSpec` pins the inequality corpus-wide). */
  def txt_cms_topk(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
    val toks = docs.select(col("doc_id"),
        explode(split(trim(col("text")), "\\s+")).as("tok"))
      .filter(col("tok") =!= "")
    val sketches = (0 until 4).map(k =>
      Sketches.cmsCounts(toks.filter(col("doc_id") % 4 === k), "tok", d = 4, w = 256))
    val sketch = Sketches.cmsMerge(sketches)
    val cands = toks.groupBy("tok").agg(count(lit(1)).as("n_exact"))
    Sketches.cmsEstimate(cands, sketch, "tok", d = 4, w = 256)
      .join(cands, "tok")
      .orderBy(col("est").desc, col("tok"))
      .limit(20)
      .select(col("tok"), col("est").cast("long").as("est"),
        col("n_exact").cast("long").as("n_exact"))
  }

  val txt_cms_topk_sql: String = {
    val h = hex8("substr(md5(CAST(i AS VARCHAR) || '_' || tok), 1, 8)")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(list_filter(
       |    regexp_split_to_array(trim(text), '\\s+'), t -> t != '')) AS tok
       |  FROM documents),
       |hh AS (SELECT tok, i, $h % 256 AS c
       |  FROM toks CROSS JOIN (SELECT unnest(range(4)) AS i)),
       |counts AS (SELECT i, c, count(*) AS cnt FROM hh GROUP BY 1, 2),
       |cands AS (SELECT tok, count(*) AS n_exact FROM toks GROUP BY 1),
       |ch AS (SELECT tok, i, $h % 256 AS c
       |  FROM cands CROSS JOIN (SELECT unnest(range(4)) AS i)),
       |est AS (SELECT ch.tok, min(counts.cnt) AS est
       |  FROM ch JOIN counts ON counts.i = ch.i AND counts.c = ch.c
       |  GROUP BY 1)
       |SELECT est.tok, CAST(est AS BIGINT) AS est,
       |  CAST(n_exact AS BIGINT) AS n_exact
       |FROM est JOIN cands ON cands.tok = est.tok
       |ORDER BY est DESC, est.tok LIMIT 20""".stripMargin
  }

  /** Streaming count-min census: heavy-hitter USERS of the event stream,
    * with the d×w cell grid maintained as Complete-mode streaming state
    * ([[graft.streaming.EventStream.streamingCmsCells]]). SUM-merge makes
    * the settled cells EXACTLY the batch sketch, so point estimates read
    * off the streamed state hash-match DuckDB's single-pass replay — the
    * stream ≡ batch identity for the second sketch family. */
  def q_stream_cms(s: SparkSession, dir: String): DataFrame = {
    val cp = new java.io.File("target/qtmp_stream",
      s"cp_cms_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    val cells = graft.streaming.EventStream.streamingCmsCells(
      s, s"$dir/events.parquet", cp.getAbsolutePath,
      valueCol = "user_id", d = 4, w = 256)
    val ev = s.read.parquet(s"$dir/events.parquet").select("user_id")
    val cands = ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
    Sketches.cmsEstimate(cands, cells, "user_id", d = 4, w = 256)
      .join(cands, "user_id")
      .orderBy(col("est").desc, col("user_id"))
      .limit(20)
      .select(col("user_id"), col("est").cast("long").as("est"),
        col("n_exact").cast("long").as("n_exact"))
  }

  val q_stream_cms_sql: String = {
    val h = hex8("substr(md5(CAST(i AS VARCHAR) || '_' || CAST(user_id AS VARCHAR)), 1, 8)")
    s"""WITH hh AS (SELECT user_id, i, $h % 256 AS c
       |  FROM events CROSS JOIN (SELECT unnest(range(4)) AS i)),
       |counts AS (SELECT i, c, count(*) AS cnt FROM hh GROUP BY 1, 2),
       |cands AS (SELECT user_id, count(*) AS n_exact FROM events GROUP BY 1),
       |ch AS (SELECT user_id, i, $h % 256 AS c
       |  FROM cands CROSS JOIN (SELECT unnest(range(4)) AS i)),
       |est AS (SELECT ch.user_id, min(counts.cnt) AS est
       |  FROM ch JOIN counts ON counts.i = ch.i AND counts.c = ch.c
       |  GROUP BY 1)
       |SELECT est.user_id, CAST(est AS BIGINT) AS est,
       |  CAST(n_exact AS BIGINT) AS n_exact
       |FROM est JOIN cands ON cands.user_id = est.user_id
       |ORDER BY est DESC, est.user_id LIMIT 20""".stripMargin
  }

  /** Streaming log2-histogram census: event-value quantiles read off a
    * histogram maintained as Complete-mode streaming state
    * ([[graft.streaming.EventStream.streamingLogHistogram]]) — the third
    * sketch family's stream ≡ batch identity (SUM merge), certified by
    * hash-matching the quantile read-off against DuckDB's single-pass
    * replay. Values are integer cents (`floor(value·100)`): IEEE double
    * multiply + floor is bit-identical in both engines. */
  def q_stream_hist(s: SparkSession, dir: String): DataFrame = {
    val cp = new java.io.File("target/qtmp_stream",
      s"cp_hist_${math.abs(dir.hashCode)}")
    deleteRec(cp)
    val hist = graft.streaming.EventStream.streamingLogHistogram(
      s, s"$dir/events.parquet", cp.getAbsolutePath,
      "CAST(floor(value * 100) AS BIGINT)")
    Sketches.histQuantiles(s, hist, Seq(50, 75, 95, 99)).orderBy("p")
  }

  val q_stream_hist_sql: String =
    """WITH v AS (SELECT CAST(floor(value * 100) AS BIGINT) AS v FROM events),
      |h AS (SELECT CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS bin,
      |  count(*) AS cnt FROM v GROUP BY 1),
      |c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum,
      |  sum(cnt) OVER () AS n FROM h),
      |p AS (SELECT unnest([50, 75, 95, 99]) AS p),
      |hit AS (SELECT p.p, c.bin, c.cum, c.n,
      |  ROW_NUMBER() OVER (PARTITION BY p.p ORDER BY c.bin) AS rn
      |  FROM p JOIN c ON c.cum * 100 >= p.p * c.n)
      |SELECT CAST(p AS INT) AS p, CAST(bin AS INT) AS bin,
      |  CAST(CASE WHEN bin = 0 THEN 0
      |    ELSE CAST(1 AS BIGINT) << (bin - 1) END AS BIGINT) AS bin_lo,
      |  CAST((CAST(1 AS BIGINT) << bin) - 1 AS BIGINT) AS bin_hi,
      |  CAST(cum AS BIGINT) AS cum, CAST(n AS BIGINT) AS n_total
      |FROM hit WHERE rn = 1 ORDER BY p""".stripMargin

  // ------------------------------------------------------- learned scoring

  /** Fixed-point coefficients of the fitted linear scorer — exported by
    * the gate (Verify dumps oracle_sql.json AFTER queries run, so the
    * literals always match the fit the gate used; same convention as the
    * ANN centroid exports). */
  @volatile private var lrCoeffsZ: Option[Seq[Long]] = None

  /** Learned linear quality scorer, hash-matched end-to-end: fit
    * token-count ~ (1, chars, distinct-tokens) by EXACT one-pass least
    * squares on the doc_id%10 "labeled" slice
    * ([[graft.operators.CorpusStats.linearFitFP]] — normal-equation sums
    * in one map-combined aggregate, BigInt Cramer on the driver), then
    * score EVERY doc with the quantized coefficients. The
    * quality-classifier-distillation shape: the expensive scorer labels a
    * slice, the cheap linear model scores the corpus. DuckDB recomputes
    * the same integer features and replays the scoring dot against the
    * exported coefficient literals bit-for-bit. */
  def txt_lrfit(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents").filter(col("text").isNotNull)
    def toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
    val feats = Seq(lit(1L), length(col("text")).cast("long"),
      size(array_distinct(toks)).cast("long"))
    val y = size(toks).cast("long")
    val coeffs = graft.operators.CorpusStats.linearFitFP(
      docs.filter(col("doc_id") % 10 === 0), feats, y, shiftBits = 20)
    lrCoeffsZ = Some(coeffs)
    docs.select(col("doc_id"), y.as("n_tokens"),
      graft.operators.CorpusStats.linearScoreFP(feats, coeffs).as("score_fp"))
  }

  def txt_lrfit_sql: String = lrCoeffsZ match {
    case None =>
      "SELECT CAST(NULL AS BIGINT) AS doc_id, CAST(NULL AS BIGINT) AS n_tokens, " +
        "CAST(NULL AS BIGINT) AS score_fp WHERE 1=0"
    case Some(cs) =>
      s"""WITH t AS (
         |  SELECT doc_id,
         |    list_filter(regexp_split_to_array(trim(text), '\\s+'),
         |      x -> x != '') AS toks,
         |    CAST(len(text) AS BIGINT) AS f1
         |  FROM documents WHERE text IS NOT NULL)
         |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         |  CAST(CAST(${cs(0)} AS BIGINT)
         |    + CAST(${cs(1)} AS BIGINT) * f1
         |    + CAST(${cs(2)} AS BIGINT) * len(list_distinct(toks))
         |    AS BIGINT) AS score_fp
         |FROM t""".stripMargin
  }

  // ------------------------------------------------------------- histogram

  /** Log2-histogram quantiles of document length: per-shard histograms
    * sum-merged, then the cumulative read-off for p50/p75/p95/p99 —
    * the sketch answer to "what's the length distribution of 100 TB"
    * (64 bins cover all Long values; the walk is over bins, not rows). */
  def q_hist_quantile(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("n_chars").cast("long").as("v"))
    val hists = (0 until 4).map(k =>
      Sketches.logHistogram(docs.filter(col("doc_id") % 4 === k), col("v")))
    val merged = Sketches.histMerge(hists)
    Sketches.histQuantiles(s, merged, Seq(50, 75, 95, 99)).orderBy("p")
  }

  val q_hist_quantile_sql: String =
    """WITH v AS (SELECT CAST(n_chars AS BIGINT) AS v FROM documents),
      |h AS (SELECT CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS bin,
      |  count(*) AS cnt FROM v GROUP BY 1),
      |c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum,
      |  sum(cnt) OVER () AS n FROM h),
      |p AS (SELECT unnest([50, 75, 95, 99]) AS p),
      |hit AS (SELECT p.p, c.bin, c.cum, c.n,
      |  ROW_NUMBER() OVER (PARTITION BY p.p ORDER BY c.bin) AS rn
      |  FROM p JOIN c ON c.cum * 100 >= p.p * c.n)
      |SELECT CAST(p AS INT) AS p, CAST(bin AS INT) AS bin,
      |  CAST(CASE WHEN bin = 0 THEN 0
      |    ELSE CAST(1 AS BIGINT) << (bin - 1) END AS BIGINT) AS bin_lo,
      |  CAST((CAST(1 AS BIGINT) << bin) - 1 AS BIGINT) AS bin_hi,
      |  CAST(cum AS BIGINT) AS cum, CAST(n AS BIGINT) AS n_total
      |FROM hit WHERE rn = 1 ORDER BY p""".stripMargin

  /** FLOAT quantile census via the fixed-point shim
    * ([[graft.operators.Sketches.fixedPoint]]): order totalprice (a
    * double) scaled by 2^20 onto the mergeable log2 histogram — per-shard
    * builds sum-merged, quantiles read off the merged bins, bounds
    * divided back to exact dyadic doubles. This is the sketch answer for
    * float-valued signals (quality scores, prices): without it they
    * needed an exact/approx percentile, which at census scale reshuffles
    * the value column. DuckDB replays scale → bin → merge → read-off
    * bit-for-bit (power-of-two multiply and divide are exact IEEE). */
  def q_float_quantile(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    val fp = ord.select(col("o_orderkey"),
      Sketches.fixedPoint(col("o_totalprice"), 20).as("v"))
    val hists = (0 until 4).map(k =>
      Sketches.logHistogram(fp.filter(col("o_orderkey") % 4 === k), col("v")))
    val merged = Sketches.histMerge(hists)
    Sketches.histQuantiles(s, merged, Seq(50, 75, 95, 99))
      .select(col("p"), col("bin"),
        (col("bin_lo").cast("double") / lit(1048576.0)).as("lo"),
        (col("bin_hi").cast("double") / lit(1048576.0)).as("hi"),
        col("cum"), col("n_total"))
      .orderBy("p")
  }

  val q_float_quantile_sql: String =
    """WITH v AS (SELECT CAST(floor(o_totalprice * 1048576.0) AS BIGINT) AS v
      |  FROM orders),
      |h AS (SELECT CASE WHEN v = 0 THEN 0 ELSE length(bin(v)) END AS bin,
      |  count(*) AS cnt FROM v GROUP BY 1),
      |c AS (SELECT bin, cnt, sum(cnt) OVER (ORDER BY bin) AS cum,
      |  sum(cnt) OVER () AS n FROM h),
      |p AS (SELECT unnest([50, 75, 95, 99]) AS p),
      |hit AS (SELECT p.p, c.bin, c.cum, c.n,
      |  ROW_NUMBER() OVER (PARTITION BY p.p ORDER BY c.bin) AS rn
      |  FROM p JOIN c ON c.cum * 100 >= p.p * c.n)
      |SELECT CAST(p AS INT) AS p, CAST(bin AS INT) AS bin,
      |  CAST(CASE WHEN bin = 0 THEN 0
      |    ELSE CAST(1 AS BIGINT) << (bin - 1) END AS DOUBLE) / 1048576.0 AS lo,
      |  CAST((CAST(1 AS BIGINT) << bin) - 1 AS DOUBLE) / 1048576.0 AS hi,
      |  CAST(cum AS BIGINT) AS cum, CAST(n AS BIGINT) AS n_total
      |FROM hit WHERE rn = 1 ORDER BY p""".stripMargin

  // --------------------------------------------------------------- z-order

  /** Z-order layout export, hash-matched through disk: docs are clustered
    * on the Morton interleave of (doc_id, n_chars) into 16 sorted files
    * ([[graft.operators.Export.writeZorderLayout]]), and a box query on
    * BOTH dimensions is answered scanning only the manifest-overlapping
    * files ([[graft.operators.Export.prunedRead2D]]). DuckDB answers the
    * same box with a full scan — mis-interleaved codes, a lost file, or a
    * wrong overlap test all hash-mismatch. `ExportLayoutSpec` separately
    * asserts both dimensions really prune files. */
  def q_export_zorder(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val out = new java.io.File(new java.io.File("target", "qtmp"),
      s"export_zorder_${math.abs(dir.hashCode)}")
    val manifest = Export.writeZorderLayout(
      s, docs, "doc_id", "n_chars", nFiles = 16, out.getAbsolutePath)
    Export.prunedRead2D(s, manifest, "doc_id", "n_chars",
        aLo = 100L, aHi = 300L, bLo = 100L, bHi = 260L)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum("doc_id").cast("long").as("id_sum"),
        sum("n_chars").cast("long").as("total_chars"))
      .orderBy("lang")
  }

  val q_export_zorder_sql: String =
    """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars
      |FROM documents
      |WHERE doc_id BETWEEN 100 AND 300 AND n_chars BETWEEN 100 AND 260
      |GROUP BY lang ORDER BY lang""".stripMargin
}
