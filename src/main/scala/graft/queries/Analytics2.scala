package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.util.Tables

/** Second tranche of verification queries: correlated and scalar
  * subqueries, outer-join distributions, conditional aggregation / pivot,
  * and quantiles — the remaining classic shapes a user of the target DB
  * runs to validate an import (SURVEY §2.3's probe-query surface,
  * generalized). Same DuckDB-parity rules as Analytics.
  */
object Analytics2 {

  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(30,8)")).cast("double")

  /** Scalar subquery: parts priced above the global average. The 1-row
    * aggregate stays IN the plan (broadcast cross join) — one job, no
    * driver round-trip, exactly how Catalyst executes the SQL form. */
  def q_scalar_subq(s: SparkSession, dir: String): DataFrame = {
    val part = Tables.load(s, dir, "part")
    val avgDf = part.agg(
      (sum(col("p_retailprice").cast("decimal(30,8)")) / count(lit(1)))
        .cast("double").as("_gavg"))
    part.crossJoin(broadcast(avgDf))
      .filter(col("p_retailprice") > col("_gavg"))
      .select("p_partkey", "p_name", "p_retailprice")
  }

  val q_scalar_subq_sql: String =
    """SELECT p_partkey, p_name, p_retailprice FROM part
      |WHERE p_retailprice >
      | (SELECT CAST(SUM(CAST(p_retailprice AS DECIMAL(30,8))) AS DOUBLE)
      |    / COUNT(*) FROM part)""".stripMargin

  /** Correlated aggregate (TPC-H Q17 shape): lineitems under 20% of the
    * part's average quantity. The correlation decorrelates into one
    * per-part aggregate joined back — no per-row subquery execution. The
    * aggregate has one row per part (sf-proportional), so no broadcast
    * hint: AQE broadcasts it at small SFs and shuffle-joins at 100×. */
  def q_correlated(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(((sum(col("l_quantity").cast("decimal(30,8)")).cast("double") /
        count(lit(1))) * 0.2).as("qty_cut"))
    li.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("l_quantity") < col("qty_cut"))
      .groupBy()
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  val q_correlated_sql: String =
    """SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,8))) AS DOUBLE) / 7.0
      |   AS avg_yearly
      |FROM lineitem l1
      |WHERE l_quantity < (
      |  SELECT (CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE)
      |     / COUNT(*)) * 0.2
      |  FROM lineitem l2 WHERE l2.l_partkey = l1.l_partkey)""".stripMargin

  /** Outer-join distribution (TPC-H Q13 shape): customers by order count,
    * including zero-order customers via left join. */
  def q_outer_dist(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer").select("c_custkey")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_custkey", "o_orderkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
  }

  val q_outer_dist_sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority != '1-URGENT'
      |  GROUP BY c_custkey) t
      |GROUP BY c_count""".stripMargin

  /** Conditional aggregation / pivot: per-user event-type value matrix. */
  def q_pivot(s: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "view", "purchase", "signup", "error")
    val aggs = types.map(t =>
      dsumWhen(col("event_type") === t, col("value")).as(s"v_$t"))
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  private def dsumWhen(cond: org.apache.spark.sql.Column,
      v: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    coalesce(sum(when(cond, v.cast("decimal(30,8)")).otherwise(lit(null))),
      lit(0).cast("decimal(30,8)")).cast("double")

  val q_pivot_sql: String =
    """SELECT user_id,
      | CAST(coalesce(SUM(CASE WHEN event_type='click' THEN CAST(value AS DECIMAL(30,8)) END), 0) AS DOUBLE) AS v_click,
      | CAST(coalesce(SUM(CASE WHEN event_type='view' THEN CAST(value AS DECIMAL(30,8)) END), 0) AS DOUBLE) AS v_view,
      | CAST(coalesce(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(30,8)) END), 0) AS DOUBLE) AS v_purchase,
      | CAST(coalesce(SUM(CASE WHEN event_type='signup' THEN CAST(value AS DECIMAL(30,8)) END), 0) AS DOUBLE) AS v_signup,
      | CAST(coalesce(SUM(CASE WHEN event_type='error' THEN CAST(value AS DECIMAL(30,8)) END), 0) AS DOUBLE) AS v_error
      |FROM events GROUP BY user_id""".stripMargin

  /** Lag/lead analytics: day-over-day order revenue deltas. */
  def q_lag_lead(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.load(s, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(dsum(col("o_totalprice")).as("rev"))
    val w = Window.orderBy(col("d"))
    daily
      .withColumn("prev_rev", lag(col("rev"), 1).over(w))
      .withColumn("delta", round(col("rev") - coalesce(col("prev_rev"), lit(0.0)), 4))
      .filter(col("d") < lit("1995-03-01").cast("date"))
      .select(col("d"), col("rev"), col("delta"))
  }

  val q_lag_lead_sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8))) AS DOUBLE) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT d, rev,
      |  round(rev - coalesce(lag(rev, 1) OVER (ORDER BY d), 0.0), 4) AS delta
      |FROM daily WHERE d < DATE '1995-03-01'""".stripMargin

  /** NOT IN with null-safe semantics: parts never ordered by any BUILDING-
    * segment customer (anti join through two hops). */
  def q_notin(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem").select("l_partkey", "l_orderkey")
    val ord = Tables.load(s, dir, "orders").select("o_orderkey", "o_custkey")
    val cust = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    // cust is a filtered slice of customer (sf-proportional) — no hint.
    val orderedByBuilding = li
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("l_partkey")).distinct()
    Tables.load(s, dir, "part").select("p_partkey", "p_brand")
      .join(orderedByBuilding, col("p_partkey") === col("l_partkey"), "left_anti")
  }

  val q_notin_sql: String =
    """SELECT p_partkey, p_brand FROM part
      |WHERE p_partkey NOT IN (
      |  SELECT l_partkey FROM lineitem, orders, customer
      |  WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |    AND c_mktsegment = 'BUILDING')""".stripMargin

  /** CUBE: counts over every grouping-set combination of two dims (the
    * grouping-sets surface beyond q_rollup; integer outputs → exact). */
  def q_cube(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders")
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
  }

  val q_cube_sql: String =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin

  /** Exact interpolated quantiles per group: Spark `percentile` and DuckDB
    * `quantile_cont` share the linear-interpolation definition; rounding to
    * 6 dp absorbs the one-ulp interpolation arithmetic differences. */
  def q_quantiles(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        round(expr("percentile(l_extendedprice, 0.5)"), 6).as("p50"),
        round(expr("percentile(l_extendedprice, 0.9)"), 6).as("p90"),
        round(expr("percentile(l_extendedprice, 0.99)"), 6).as("p99"))
  }

  val q_quantiles_sql: String =
    """SELECT l_returnflag,
      | round(quantile_cont(l_extendedprice, 0.5), 6) AS p50,
      | round(quantile_cont(l_extendedprice, 0.9), 6) AS p90,
      | round(quantile_cont(l_extendedprice, 0.99), 6) AS p99
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Salted skew join (operators.Skew wired into the gate): the fact key
    * is made deliberately Zipfian — ~70% of lineitem rows collapse onto
    * supplier key 1 — which at scale puts one reducer hours behind. The
    * salted join shards the hot key over 16 sub-keys structurally (not
    * post-hoc like AQE's skew split) and must produce EXACTLY the rows of
    * the unsalted join, which the oracle runs. */
  def q_skew_join(s: SparkSession, dir: String): DataFrame = {
    val fact = Tables.load(s, dir, "lineitem")
      .withColumn("sk",
        when(pmod(col("l_orderkey"), lit(10)) < 7, lit(1L))
          .otherwise(col("l_suppkey")))
    val dim = Tables.load(s, dir, "supplier")
      .select(col("s_suppkey").as("sk"), col("s_nationkey"))
    graft.operators.Skew.saltedJoin(fact, dim, "sk",
        saltFrom = col("l_orderkey") * 8 + col("l_linenumber"), salts = 16)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("l_quantity").cast("decimal(30,8)")), 2)
          .cast("double").as("qty"))
  }

  val q_skew_join_sql: String =
    """SELECT s_nationkey, COUNT(*) AS n,
      | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,8))), 2) AS DOUBLE) AS qty
      |FROM (SELECT CASE WHEN l_orderkey % 10 < 7 THEN 1 ELSE l_suppkey END
      |        AS sk, l_quantity FROM lineitem) f
      |JOIN supplier ON sk = s_suppkey
      |GROUP BY s_nationkey""".stripMargin

  /** Exact distinct counts + HLL sketch side-by-side (sketch column is
    * engine-specific → compare only the exact ones; approx shown in the
    * rows-only variant of this concept via dedup queries). */
  def q_distinct_stats(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_partkey")).as("parts"),
        countDistinct(col("l_suppkey")).as("supps"),
        count(lit(1)).as("rows_n"))
  }

  val q_distinct_stats_sql: String =
    """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS parts,
      | COUNT(DISTINCT l_suppkey) AS supps, COUNT(*) AS rows_n
      |FROM lineitem GROUP BY l_returnflag""".stripMargin

  /** Explicit GROUPING SETS (the shape rollup/cube can't express:
    * hand-picked combinations only) with `grouping_id` disambiguating
    * the null-as-total rows from genuine nulls. */
  def q_grouping_sets(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders")
      .createOrReplaceTempView("_gs_orders")
    s.sql("""SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping_id() AS INT) AS gid, count(*) AS n
      |FROM _gs_orders
      |GROUP BY o_orderstatus, o_orderpriority
      |  GROUPING SETS ((o_orderstatus), (o_orderpriority),
      |    (o_orderstatus, o_orderpriority))
      |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin)
  }

  val q_grouping_sets_sql: String =
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority)
      |    AS INT) AS gid,
      |  count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
      |  (o_orderstatus, o_orderpriority))
      |ORDER BY gid, o_orderstatus, o_orderpriority""".stripMargin

  /** RANGE-frame sliding window: each event's trailing-hour per-user
    * value sum — the value-based frame (`RANGE BETWEEN x PRECEDING`) the
    * row-based windows can't express; frames are bounded by the hour, so
    * state per row is the in-frame slice regardless of history length. */
  def q_range_window(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"))
      .rangeBetween(-3600000000L, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("hour_sum",
        round(sum(col("value").cast("decimal(30,8)")).over(w), 4)
          .cast("double"))
      .filter(col("user_id") % 20 === 0)
      .select(col("user_id"), col("ts").as("ts_us"), col("hour_sum"))
      .orderBy("user_id", "ts_us")
  }

  val q_range_window_sql: String =
    """SELECT user_id, ts_us,
      |  CAST(round(sum(CAST(value AS DECIMAL(30,8))) OVER (
      |    PARTITION BY user_id ORDER BY ts_us
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW), 4)
      |    AS DOUBLE) AS hour_sum
      |FROM (SELECT user_id, epoch_us(ts) AS ts_us, value FROM events)
      |WHERE user_id % 20 = 0
      |ORDER BY user_id, ts_us""".stripMargin

  /** MERGE INTO / upsert ([[graft.operators.Merge.upsert]]): a
    * deterministic update batch (every 10th order re-priced ×2, status
    * 'U') plus synthetic inserts lands on orders; the aggregate of the
    * merged table hash-matches DuckDB's CASE-based replay — matched rows
    * take update values, inserts appear, the rest pass through. */
  def q_upsert(s: SparkSession, dir: String): DataFrame = {
    val ord = Tables.load(s, dir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    val updates = ord.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .withColumn("o_orderstatus", lit("U"))
    val inserts = s.range(3).select(
      (col("id") + 900000000L).as("o_orderkey"),
      lit(1L).as("o_custkey"),
      lit(42.5).as("o_totalprice"),
      lit("N").as("o_orderstatus"))
    graft.operators.Merge.upsert(ord, updates.unionByName(inserts),
        Seq("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(30,8)")), 2)
          .cast("double").as("total"))
      .orderBy("o_orderstatus")
  }

  val q_upsert_sql: String =
    """WITH merged AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice * 2
      |         ELSE o_totalprice END AS o_totalprice,
      |    CASE WHEN o_orderkey % 10 = 0 THEN 'U'
      |         ELSE o_orderstatus END AS o_orderstatus
      |  FROM orders
      |  UNION ALL
      |  SELECT 900000000 + i, 42.5, 'N'
      |  FROM (SELECT unnest(range(3)) AS i))
      |SELECT o_orderstatus, count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(30,8))), 2) AS DOUBLE)
      |    AS total
      |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  /** Incremental aggregate maintenance
    * ([[graft.operators.Merge.mergeAggregates]]): the pre-aggregated
    * base (90% of lineitem) refreshed from a delta batch (the other 10%)
    * by merging partial-aggregate rows — no base rescan. The oracle is
    * the FULL recompute, so the hash match proves the associative-merge
    * law for the count/sum/min/max decomposition. */
  def q_incr_agg(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.load(s, dir, "lineitem")
    def part(f: org.apache.spark.sql.Column) = li.filter(f)
      .groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(30,8)")).as("qty"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"))
    val base = part(col("l_orderkey") % 10 =!= 0)
    val delta = part(col("l_orderkey") % 10 === 0)
    graft.operators.Merge.mergeAggregates(Seq(base, delta),
        Seq("l_returnflag"), sums = Seq("n", "qty"),
        mins = Seq("first_ship"), maxs = Seq("last_ship"))
      .select(col("l_returnflag"), col("n"),
        round(col("qty"), 2).cast("double").as("qty"),
        unix_micros(col("first_ship").cast("timestamp"))
          .as("first_ship_us"),
        unix_micros(col("last_ship").cast("timestamp"))
          .as("last_ship_us"))
      .orderBy("l_returnflag")
  }

  val q_incr_agg_sql: String =
    """SELECT l_returnflag, count(*) AS n,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(30,8))), 2) AS DOUBLE)
      |    AS qty,
      |  epoch_us(min(l_shipdate)) AS first_ship_us,
      |  epoch_us(max(l_shipdate)) AS last_ship_us
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Declarative data-quality suite ([[graft.operators.DataQuality]] —
    * the post-import validation report the reference's users run by hand
    * against the target DB): key uniqueness, completeness, range
    * constraints, and lineitem→orders referential integrity, all
    * row-local checks folded into ONE conditional-aggregate scan per
    * table. */
  def q_dq_report(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.DataQuality._
    val ord = Tables.load(s, dir, "orders")
    val li = Tables.load(s, dir, "lineitem")
    val ordReport = report(ord, Seq(
      Unique("orders.o_orderkey.unique", col("o_orderkey")),
      Satisfies("orders.o_totalprice.non_negative",
        col("o_totalprice") >= 0)))
    val liReport = report(li, Seq(
      Complete("lineitem.l_shipdate.complete", col("l_shipdate")),
      Satisfies("lineitem.l_discount.in_range",
        col("l_discount").between(0, 1)),
      RefIntegrity("lineitem.l_orderkey.ref_orders", col("l_orderkey"),
        ord, col("o_orderkey"))))
    ordReport.unionByName(liReport).orderBy("check")
  }

  val q_dq_report_sql: String =
    """SELECT * FROM (
      |  SELECT 'orders.o_orderkey.unique' AS check,
      |    round(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*), 9)
      |      AS metric,
      |    CAST(CAST(count(DISTINCT o_orderkey) AS DOUBLE) / count(*)
      |      >= 1.0 AS INT) AS passed
      |  FROM orders
      |  UNION ALL
      |  SELECT 'orders.o_totalprice.non_negative',
      |    round(avg(CASE WHEN o_totalprice >= 0 THEN 1.0 ELSE 0.0 END), 9),
      |    CAST(avg(CASE WHEN o_totalprice >= 0 THEN 1.0 ELSE 0.0 END)
      |      >= 1.0 AS INT)
      |  FROM orders
      |  UNION ALL
      |  SELECT 'lineitem.l_shipdate.complete',
      |    round(avg(CASE WHEN l_shipdate IS NOT NULL THEN 1.0 ELSE 0.0 END), 9),
      |    CAST(avg(CASE WHEN l_shipdate IS NOT NULL THEN 1.0 ELSE 0.0 END)
      |      >= 1.0 AS INT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem.l_discount.in_range',
      |    round(avg(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 1.0 ELSE 0.0 END), 9),
      |    CAST(avg(CASE WHEN l_discount BETWEEN 0 AND 1 THEN 1.0 ELSE 0.0 END)
      |      >= 1.0 AS INT)
      |  FROM lineitem
      |  UNION ALL
      |  SELECT 'lineitem.l_orderkey.ref_orders',
      |    round(CAST((SELECT count(*) FROM lineitem
      |                WHERE l_orderkey IS NOT NULL AND l_orderkey IN
      |                  (SELECT o_orderkey FROM orders)) AS DOUBLE)
      |      / count(*), 9),
      |    CAST(CAST((SELECT count(*) FROM lineitem
      |                WHERE l_orderkey IS NOT NULL AND l_orderkey IN
      |                  (SELECT o_orderkey FROM orders)) AS DOUBLE)
      |      / count(*) >= 1.0 AS INT)
      |  FROM lineitem)
      |ORDER BY "check"""".stripMargin

  /** RECURSIVE CTE (Spark 4 `WITH RECURSIVE` → UnionLoop execution):
    * binary-heap ancestor walk — every orderkey under 1024 climbs
    * node → node DIV 2 to the root, emitting depth and path sum. The
    * canonical iterate-to-fixpoint query shape (BOM explosion, org
    * charts, graph reachability) expressed in plain SQL on BOTH engines;
    * DuckDB replays the identical recursion with its own recursive CTE,
    * so the hash match certifies the loop semantics, not just one
    * expansion. Depth is log2(1024) = 10 — far under the recursion
    * limit; at scale each iteration is one distributed join/union over
    * the frontier, never a driver loop. */
  def q_recursive_cte(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "orders").createOrReplaceTempView("orders_rec")
    s.sql(
      """WITH RECURSIVE anc AS (
        |  SELECT o_orderkey AS start, o_orderkey AS node, 0 AS depth
        |  FROM orders_rec WHERE o_orderkey < 1024
        |  UNION ALL
        |  SELECT start, node DIV 2, depth + 1 FROM anc WHERE node > 1
        |)
        |SELECT start, CAST(max(depth) AS INT) AS depth,
        |  CAST(sum(node) AS BIGINT) AS path_sum,
        |  CAST(count(*) AS BIGINT) AS n_nodes
        |FROM anc GROUP BY start ORDER BY start""".stripMargin)
  }

  val q_recursive_cte_sql: String =
    """WITH RECURSIVE anc AS (
      |  SELECT o_orderkey AS start, o_orderkey AS node, 0 AS depth
      |  FROM orders WHERE o_orderkey < 1024
      |  UNION ALL
      |  SELECT start, node // 2, depth + 1 FROM anc WHERE node > 1
      |)
      |SELECT start, CAST(max(depth) AS INT) AS depth,
      |  CAST(sum(node) AS BIGINT) AS path_sum,
      |  CAST(count(*) AS BIGINT) AS n_nodes
      |FROM anc GROUP BY start ORDER BY start""".stripMargin

  /** VARIANT ingestion (Spark 4's semi-structured type): JSON documents
    * parsed ONCE into variant, fields then extracted typed — the
    * schema-on-read path for event payloads whose shape drifts, priced
    * as binary-encoded variant access instead of per-field JSON
    * re-parsing. The JSON is built in-query from the documents table
    * (deterministic), round-tripped parse_json → variant_get with
    * string, bigint, and array-element extractions plus a missing-field
    * probe (NULL, not an error). DuckDB replays with its JSON accessors
    * on the same constructed payloads. */
  def q_variant(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "documents").createOrReplaceTempView("docs_var")
    s.sql(
      """WITH j AS (
        |  SELECT doc_id,
        |    to_json(named_struct(
        |      'lang', lang,
        |      'n', n_chars,
        |      'tags', array(doc_id % 7, doc_id % 11))) AS payload
        |  FROM docs_var),
        |v AS (SELECT doc_id, parse_json(payload) AS pv FROM j)
        |SELECT doc_id,
        |  variant_get(pv, '$.lang', 'string') AS lang_v,
        |  variant_get(pv, '$.n', 'bigint') AS n_v,
        |  variant_get(pv, '$.tags[1]', 'bigint') AS tag1_v,
        |  variant_get(pv, '$.missing', 'string') AS missing_v
        |FROM v ORDER BY doc_id""".stripMargin)
  }

  val q_variant_sql: String =
    """WITH j AS (
      |  SELECT doc_id,
      |    to_json(struct_pack(lang := lang, n := n_chars,
      |      tags := [doc_id % 7, doc_id % 11])) AS payload
      |  FROM documents)
      |SELECT doc_id,
      |  json_extract_string(payload, '$.lang') AS lang_v,
      |  CAST(json_extract(payload, '$.n') AS BIGINT) AS n_v,
      |  CAST(json_extract(payload, '$.tags[1]') AS BIGINT) AS tag1_v,
      |  json_extract_string(payload, '$.missing') AS missing_v
      |FROM j ORDER BY doc_id""".stripMargin
}
