package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.util.Tables

/** Verification-query surface: the reference checks imports with
  * count/sum/min/max/crc32 probe queries on the target DB
  * (reference: tests/examples/run.sh:57-61). In a Spark-native engine those
  * probes run natively; this module is that query surface, sized for 100 TB:
  * group-bys are partial-aggregated map-side, joins broadcast their small
  * side, top-k avoids a global sort via TakeOrderedAndProject.
  *
  * DuckDB-parity notes (the oracle hashes values after sorting columns by
  * name): double sums are computed as decimal sums (order-free, exact) and
  * cast back to double, so Spark's partial-agg ordering cannot flip low bits.
  */
object Analytics {

  /** sum(double) that is deterministic and engine-independent. */
  private def dsum(c: Column): Column =
    sum(c.cast("decimal(30,8)")).cast("double")

  /** Exact decimal sum, rounded to 2 dp and cast to DOUBLE. The decimal sum
    * itself is order-free and bit-exact cross-engine, but a raw
    * decimal(38,8)→double conversion diverges by 1 ulp once the unscaled
    * value crosses 2^53 (DuckDB's int128→double double-rounds). Rounding to
    * 2 dp first keeps the unscaled value < 2^53 up to ~7×10¹³, where
    * decimal→double is exact in every engine — so the doubles are
    * bit-identical no matter which engine did the conversion. */
  private def dsum2(c: Column): Column =
    round(sum(c.cast("decimal(30,8)")), 2).cast("double")

  def q1_agg(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum2(col("l_quantity")).as("sum_qty"),
        dsum2(col("l_extendedprice")).as("sum_base_price"),
        dsum2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum2(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
  }

  val q1_sql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_qty,
      | CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_base_price,
      | CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_disc_price,
      | CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount)*(1+l_tax) AS DECIMAL(30,8))), 2) AS DOUBLE) AS sum_charge,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) / COUNT(*) AS avg_qty,
      | COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3-like: top-10 unshipped orders by revenue.
    * No broadcast hints: customer/orders grow with the data, so a hard-coded
    * broadcast becomes a driver OOM at 100× scale — AQE broadcasts at small
    * SFs on its own and falls back to shuffle joins when the side is big.
    * Top-k via orderBy+limit compiles to TakeOrderedAndProject (no global
    * sort materialization). */
  def q3_topk(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1997-03-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1997-03-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3_sql: String =
    """SELECT l_orderkey, o_orderdate,
      | CAST(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,8))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1997-03-15 00:00:00'
      |  AND l_shipdate  > TIMESTAMP '1997-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q5-like: revenue per nation via a 6-table join. Only the
    * fixed-cardinality dimensions (nation=25 rows, region=5) carry broadcast
    * hints; customer/supplier scale with the data, so their join strategy is
    * left to AQE (broadcast at small SF, shuffle at 100×). */
  def q5_join(s: SparkSession, dir: String): DataFrame = {
    val region = Tables.load(s, dir, "region").filter(col("r_name") === "ASIA")
    val nation = Tables.load(s, dir, "nation")
    val cust = Tables.load(s, dir, "customer")
    val sup = Tables.load(s, dir, "supplier")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.load(s, dir, "lineitem")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
                 col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsum2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"))
  }

  val q5_sql: String =
    """SELECT n_name,
      | CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name""".stripMargin

  /** Window functions: per-customer order sequence + running spend.
    * One shuffle on o_custkey serves both window specs. */
  def q_window(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Tables.load(s, dir, "orders")
      .withColumn("order_seq", row_number().over(w))
      .withColumn("running_spend",
        sum(col("o_totalprice").cast("decimal(30,8)"))
          .over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double"))
      .filter(col("order_seq") <= 3)
      .select("o_custkey", "o_orderkey", "order_seq", "running_spend")
  }

  val q_window_sql: String =
    """SELECT o_custkey, o_orderkey, order_seq, running_spend FROM (
      | SELECT o_custkey, o_orderkey,
      |  ROW_NUMBER() OVER w AS order_seq,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_spend
      | FROM orders
      | WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
      |) t WHERE order_seq <= 3""".stripMargin

  /** Anti join: customers with no large order (NOT EXISTS). Broadcast-able
    * when the distinct key side is small; at scale Spark picks shuffled hash. */
  def q_antijoin(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.load(s, dir, "customer")
    val ord = Tables.load(s, dir, "orders")
      .filter(col("o_totalprice") > 300000).select("o_custkey")
    cust.join(ord, cust("c_custkey") === ord("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  val q_antijoin_sql: String =
    """SELECT c_custkey, c_name FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
      |  AND o.o_totalprice > 300000)""".stripMargin

  /** Semi join (EXISTS): suppliers that shipped in 1995. */
  def q_semijoin(s: SparkSession, dir: String): DataFrame = {
    val sup = Tables.load(s, dir, "supplier")
    val li = Tables.load(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1996-01-01").cast("timestamp"))
      .select("l_suppkey")
    sup.join(li, sup("s_suppkey") === li("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
  }

  val q_semijoin_sql: String =
    """SELECT s_suppkey, s_name FROM supplier s
      |WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey
      |  AND l.l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND l.l_shipdate <  TIMESTAMP '1996-01-01 00:00:00')""".stripMargin

  /** Set ops + distinct: nations that have customers or suppliers. */
  def q_setops(s: SparkSession, dir: String): DataFrame = {
    val c = Tables.load(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val su = Tables.load(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    c.union(su).distinct().orderBy("nationkey")
  }

  val q_setops_sql: String =
    """SELECT nationkey FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  UNION SELECT s_nationkey AS nationkey FROM supplier
      |) t ORDER BY nationkey""".stripMargin

  /** Grouping sets / rollup (declared absent in the reference's own engine,
    * but part of the verification-query surface a user needs). */
  def q_rollup(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
  }

  val q_rollup_sql: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      | CAST(SUM(CAST(l_quantity AS DECIMAL(30,8))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** Events: per-type stats over the event stream table (batch view).
    * `ts` compared as epoch-µs (see Tables.events). */
  def q_events_agg(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("users"),
        dsum(col("value")).as("total_value"),
        max(col("ts")).as("last_ts_us"))
  }

  val q_events_agg_sql: String =
    """SELECT event_type, COUNT(*) AS n, COUNT(DISTINCT user_id) AS users,
      | CAST(SUM(CAST(value AS DECIMAL(30,8))) AS DOUBLE) AS total_value,
      | epoch_us(MAX(ts)) AS last_ts_us
      |FROM events GROUP BY event_type""".stripMargin

  /** TPC-H Q7 shape (volume shipping): bilateral supplier-nation ↔
    * customer-nation trade volume by ship year — the 6-table multi-join
    * with a DISJUNCTIVE cross-nation predicate, the join-reorder workout
    * q5's star join doesn't exercise. The two single-row nation dims ride
    * broadcasts; the disjunction stays in the join condition where
    * Catalyst can still plan an equi-join on the keys. */
  def q7_volume(s: SparkSession, dir: String): DataFrame = {
    val n1 = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.load(s, dir, "nation")
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    Tables.load(s, dir, "lineitem")
      .join(Tables.load(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.load(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(Tables.load(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(dsum2(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("volume"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  val q7_volume_sql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      | CAST(year(l_shipdate) AS INT) AS l_year,
      | CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(30,8))), 2) AS DOUBLE) AS volume
      |FROM lineitem, orders, customer, supplier, nation n1, nation n2
      |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
      |  AND l_suppkey = s_suppkey
      |  AND s_nationkey = n1.n_nationkey AND c_nationkey = n2.n_nationkey
      |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  /** Window-rank breadth: ntile quartiles, percent_rank and cume_dist
    * over customer balances WITHIN each nation — the rank-family windows
    * the lag/lead and row_number gates don't touch. Partitioned by
    * nation, so no single-partition global window at any scale; doubles
    * come out of exact integer rank arithmetic (rank-1)/(n-1) etc.,
    * rounded on both sides. */
  def q_ntile(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_nationkey")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    Tables.load(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 9))
      .withColumn("cume", round(cume_dist().over(w), 9))
      .filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), col("quartile"), col("pct_rank"), col("cume"))
      .orderBy("c_custkey")
  }

  val q_ntile_sql: String =
    """SELECT c_custkey,
      | CAST(ntile(4) OVER w AS INT) AS quartile,
      | round(percent_rank() OVER w, 9) AS pct_rank,
      | round(cume_dist() OVER w, 9) AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
      |QUALIFY c_custkey % 10 = 0
      |ORDER BY c_custkey""".stripMargin
}
