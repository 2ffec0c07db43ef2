package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.TemporalJoin
import graft.util.Tables

/** Temporal-join gate queries over the events table (hash-matched: all
  * outputs are BIGINT ids/epoch-µs — integer-exact cross-engine).
  * Durations derive from `event_id % k` (pure integer arithmetic), never
  * from DOUBLE columns: Spark truncates double→long casts while DuckDB
  * rounds, so a float-derived bound would flake by one µs. */
object Temporal {

  /** As-of join: each purchase event attaches the latest view event of
    * the same user at-or-before it (classic attribution shape). */
  def q_asof_join(s: SparkSession, dir: String): DataFrame = {
    val evs = Tables.events(s, dir)
    val purchases = evs.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"))
    val views = evs.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"), col("event_id").as("v_id"))
    TemporalJoin.asofJoin(purchases, views, key = "user_id",
        leftTime = "p_ts", rightTime = "v_ts", tieCol = "v_id")
      .select(col("p_id"), col("user_id"), col("p_ts"),
        col("asof_v_id").as("v_id"), col("asof_v_ts").as("v_ts"))
      .orderBy(col("p_id"))
  }

  val q_asof_join_sql: String =
    """WITH p AS (SELECT user_id, epoch_us(ts) AS p_ts, event_id AS p_id
      |           FROM events WHERE event_type = 'purchase'),
      |v AS (SELECT user_id, epoch_us(ts) AS v_ts, event_id AS v_id
      |      FROM events WHERE event_type = 'view'),
      |m AS (SELECT p.p_id, p.user_id, p.p_ts,
      |        (SELECT max(v_ts) FROM v
      |         WHERE v.user_id = p.user_id AND v.v_ts <= p.p_ts) AS v_ts
      |      FROM p)
      |SELECT m.p_id, m.user_id, m.p_ts,
      |  (SELECT max(v_id) FROM v
      |   WHERE v.user_id = m.user_id AND v.v_ts = m.v_ts) AS v_id,
      |  m.v_ts
      |FROM m ORDER BY p_id""".stripMargin

  /** Range join: clicks landing inside same-user view windows
    * [v_ts, v_ts + (v_id % 30 + 1) minutes] — one row per click with its
    * covering-window count (point-in-interval at banded-equi-join cost). */
  def q_range_join(s: SparkSession, dir: String): DataFrame = {
    val evs = Tables.events(s, dir)
    val clicks = evs.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_id"))
    val views = evs.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"),
        (col("ts") + (col("event_id") % 30 + 1) * 60000000L).as("v_end"))
    TemporalJoin.rangeJoin(clicks, views, key = "user_id",
        pointCol = "c_ts", startCol = "v_ts", endCol = "v_end",
        bucketUs = 1800000000L) // 30 min ≥ the longest window
      .groupBy(col("c_id"))
      .agg(count(lit(1)).as("n_windows"))
      .orderBy(col("c_id"))
  }

  val q_range_join_sql: String =
    """WITH c AS (SELECT user_id, epoch_us(ts) AS c_ts, event_id AS c_id
      |           FROM events WHERE event_type = 'click'),
      |v AS (SELECT user_id, epoch_us(ts) AS v_ts,
      |        epoch_us(ts) + (event_id % 30 + 1) * 60000000 AS v_end
      |      FROM events WHERE event_type = 'view')
      |SELECT c_id, CAST(count(*) AS BIGINT) AS n_windows
      |FROM c JOIN v ON c.user_id = v.user_id
      |            AND c.c_ts BETWEEN v.v_ts AND v.v_end
      |GROUP BY c_id ORDER BY c_id""".stripMargin

  /** Deterministic stratified sample (content-addressed md5-prefix keys,
    * reproducible by any engine — `operators/Sampling`): 30% of clicks,
    * 10% of views, 50% of errors; other types drop. Integer aggregates
    * per class prove the exact same rows were selected. */
  def q_sample_stratified(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val evs = Tables.events(s, dir)
    Sampling.stratifiedSample(evs, col("event_id"), col("event_type"),
        Map("click" -> 0.30, "view" -> 0.10, "error" -> 0.50))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_sampled"),
        min(col("event_id")).as("min_id"),
        max(col("event_id")).as("max_id"),
        sum(col("event_id")).as("id_sum"))
      .orderBy(col("event_type"))
  }

  val q_sample_stratified_sql: String = {
    def thr(rate: Double) = f"${math.ceil(rate * 65536).toLong}%04x"
    s"""WITH k AS (SELECT event_type, event_id,
       |  substr(md5(CAST(event_id AS VARCHAR)), 1, 4) AS hk
       |  FROM events WHERE event_type IN ('click', 'view', 'error')),
       |s AS (SELECT * FROM k WHERE
       |     (event_type = 'click' AND hk < '${thr(0.30)}')
       |  OR (event_type = 'view'  AND hk < '${thr(0.10)}')
       |  OR (event_type = 'error' AND hk < '${thr(0.50)}'))
       |SELECT event_type, CAST(count(*) AS BIGINT) AS n_sampled,
       |  min(event_id) AS min_id, max(event_id) AS max_id,
       |  CAST(sum(event_id) AS BIGINT) AS id_sum
       |FROM s GROUP BY event_type ORDER BY event_type""".stripMargin
  }

  /** Mixture rebalancing by exact per-class CAPS, hash-matched: cap the
    * `en` and `de` slices of the corpus at fixed document counts, keep
    * every other language whole — deterministic md5-rank selection, so
    * DuckDB reproduces the exact kept set. */
  def q_mix_rebalance(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val docs = Tables.load(s, dir, "documents").filter(col("text").isNotNull)
    Sampling.rebalanceByCaps(docs, col("doc_id"), col("lang"),
        Map("en" -> 120L, "de" -> 50L))
      .select(col("doc_id"), col("lang"))
      .orderBy("doc_id")
  }

  val q_mix_rebalance_sql: String =
    """WITH r AS (SELECT doc_id, lang,
      |  row_number() OVER (PARTITION BY lang
      |    ORDER BY substr(md5(CAST(doc_id AS VARCHAR)), 1, 4), doc_id) AS rk
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT doc_id, lang FROM r
      |WHERE (lang = 'en' AND rk <= 120) OR (lang = 'de' AND rk <= 50)
      |   OR lang NOT IN ('en', 'de') OR lang IS NULL
      |ORDER BY doc_id""".stripMargin

  /** Deterministic global training-order shuffle, hash-matched: every doc
    * gets its epoch-42 position as (shard, pos) — reading shards in name
    * order and rows in pos order IS the md5(seed|id) global permutation,
    * without a single-partition global sort (PlanSpec locks that). */
  def q_order_shuffle(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val docs = Tables.load(s, dir, "documents").select(col("doc_id"))
    Sampling.orderShuffle(docs, col("doc_id"), seed = 42L, shardHexDigits = 1)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy(col("shard"), col("pos"))
  }

  val q_order_shuffle_sql: String =
    """WITH k AS (SELECT doc_id,
      |  md5('42|' || CAST(doc_id AS VARCHAR)) AS ky FROM documents)
      |SELECT doc_id, substr(ky, 1, 1) AS shard,
      |  CAST(row_number() OVER (PARTITION BY substr(ky, 1, 1)
      |    ORDER BY ky) AS BIGINT) AS pos
      |FROM k ORDER BY shard, pos""".stripMargin

  /** Temperature-based mixture sampling (n^α domain rebalance, α = 0.5,
    * budget 400 over the 500-doc corpus), hash-matched: both engines
    * count classes, compute rates min(1, budget·(n^α/Σn^α)/n), quantize
    * to the 1/65536 md5-threshold grid, and keep the identical rows —
    * `fr` lands above rate 1.0, exercising the keep-everything branch.
    * Integer per-class aggregates prove row-identical selection. */
  def q_temperature_mix(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val docs = Tables.load(s, dir, "documents")
    Sampling.temperatureMixture(docs, col("doc_id"), col("lang"),
        alpha = 0.5, budget = 400L)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_kept"), sum(col("doc_id")).as("id_sum"))
      .orderBy(col("lang"))
  }

  /** Best-of-domain selection, hash-matched: the top 25 longest docs per
    * language (deterministic doc_id tie-break) — the quality-ranked
    * mixture construction device, one window shuffle keyed on the
    * class. */
  def q_best_per_class(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Sampling
    val docs = Tables.load(s, dir, "documents").filter(col("text").isNotNull)
    Sampling.topKPerClass(docs, col("lang"), col("n_chars"), col("doc_id"),
        k = 25)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  val q_best_per_class_sql: String =
    """WITH r AS (SELECT doc_id, lang, n_chars,
      |  row_number() OVER (PARTITION BY lang
      |    ORDER BY n_chars DESC, doc_id) AS rk
      |  FROM documents WHERE text IS NOT NULL)
      |SELECT doc_id, lang, n_chars FROM r WHERE rk <= 25
      |ORDER BY doc_id""".stripMargin

  val q_temperature_mix_sql: String =
    """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
      |           FROM documents GROUP BY lang),
      |z AS (SELECT sum(pow(CAST(n AS DOUBLE), 0.5)) AS z FROM c),
      |t AS (SELECT lang,
      |    CAST(ceil(LEAST(1.0, 400 * (pow(CAST(n AS DOUBLE), 0.5) / z.z) / n)
      |      * 65536) AS BIGINT) AS q
      |  FROM c, z),
      |k AS (SELECT d.doc_id, d.lang,
      |    substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) AS hk, t.q
      |  FROM documents d JOIN t USING (lang)),
      |s AS (SELECT * FROM k
      |      WHERE q >= 65536 OR hk < lower(lpad(to_hex(q), 4, '0')))
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_kept,
      |  CAST(sum(doc_id) AS BIGINT) AS id_sum
      |FROM s GROUP BY lang ORDER BY lang""".stripMargin
}
