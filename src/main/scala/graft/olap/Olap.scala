package graft.olap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.gfunctions._
import graft.sources.Tables

/** Relational/OLAP core (SURVEY.md §2.B).
  *
  * Conventions for oracle-exactness (SURVEY.md §4): money sums in
  * decimal(18,2) surfaced as double; every output ordered by a
  * deterministic key; every computed column aliased identically in
  * Spark and DuckDB SQL.
  *
  * Scale notes: dims (region/nation/supplier/part at TPC-H ratios) are
  * broadcast explicitly; fact-fact joins shuffle on the join key once;
  * aggregations are partial (map-side) by construction.
  */
object Olap {

  private val Rev = "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  /** TPC-H Q1 pricing summary: single scan, map-side partial agg, one
    * shuffle on a 6-value key. At 100 TB the scan dominates; the
    * shipdate filter and 7-column ReadSchema push into parquet.
    */
  val q1 = GraftQuery(
    "q1_pricing_summary",
    Some(s"""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
             CAST(SUM($Rev) AS DOUBLE) AS sum_disc_price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
             CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    (s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_extendedprice")).as("avg_price"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus"),
  )

  /** TPC-H Q3 shipping priority: broadcast the filtered customer side
    * into orders, shuffle-join lineitem on orderkey, top-10 via
    * TakeOrderedAndProject (no global sort materialization).
    */
  val q3 = GraftQuery(
    "q3_shipping_priority",
    Some(s"""
      SELECT l_orderkey,
             CAST(SUM($Rev) AS DOUBLE) AS revenue,
             o_orderdate, o_orderpriority
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1997-06-30'
        AND l_shipdate  > TIMESTAMP '1997-06-30'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10"""),
    (s, d) => {
      val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      Tables.orders(s, d)
        .filter(col("o_orderdate") < to_timestamp(lit("1997-06-30")))
        .join(broadcast(cust), col("c_custkey") === col("o_custkey"))
        .join(
          Tables.lineitem(s, d).filter(col("l_shipdate") > to_timestamp(lit("1997-06-30"))),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
  )

  /** TPC-H Q5 local supplier volume: 6-way join; all dims broadcast so
    * the only shuffles are the two fact joins + final 25-key agg.
    */
  val q5 = GraftQuery(
    "q5_local_supplier",
    Some(s"""
      SELECT n_name, CAST(SUM($Rev) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name"""),
    (s, d) => {
      val nations = Tables.nation(s, d)
        .join(broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
      val supp = Tables.supplier(s, d)
        .join(broadcast(nations), col("s_nationkey") === col("n_nationkey"))
      Tables.orders(s, d)
        .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
          col("o_orderdate") < to_timestamp(lit("1998-01-01")))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .join(Tables.lineitem(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(supp),
          col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
        .groupBy("n_name")
        .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
  )

  /** Join + agg + global top-k. */
  val topCustomers = GraftQuery(
    "q_top_customers",
    Some("""
      SELECT c_custkey, c_name,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spent,
             COUNT(*) AS n_orders
      FROM customer JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name
      ORDER BY total_spent DESC, c_custkey
      LIMIT 20"""),
    (s, d) =>
      Tables.orders(s, d)
        .join(broadcast(Tables.customer(s, d)), col("c_custkey") === col("o_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(dsum(col("o_totalprice")).as("total_spent"), count(lit(1)).as("n_orders"))
        .orderBy(col("total_spent").desc, col("c_custkey"))
        .limit(20),
  )

  /** Running sum per key — window frame, single shuffle on the
    * partition key. ROWS frame stated explicitly so Spark and the
    * oracle agree on tie handling.
    */
  val windowRunning = GraftQuery(
    "q_window_running",
    Some("""
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spent
      FROM orders
      ORDER BY o_custkey, o_orderdate, o_orderkey"""),
    (s, d) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(
          col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          sum(dec2(col("o_totalprice"))).over(w).cast("double").as("running_spent"))
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    },
  )

  /** Partitioned ranking (dense_rank), deterministic tie-break. */
  val rankParts = GraftQuery(
    "q_rank_parts",
    Some("""
      SELECT * FROM (
        SELECT p_brand, p_partkey, p_retailprice,
               DENSE_RANK() OVER (PARTITION BY p_brand
                 ORDER BY p_retailprice DESC, p_partkey) AS rnk
        FROM part) t
      WHERE rnk <= 3
      ORDER BY p_brand, rnk, p_partkey"""),
    (s, d) => {
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, d)
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          dense_rank().over(w).as("rnk"))
        .filter(col("rnk") <= 3)
        .orderBy("p_brand", "rnk", "p_partkey")
    },
  )

  /** ROLLUP hierarchical aggregate (status → priority). */
  val rollupAgg = GraftQuery(
    "q_rollup",
    Some("""
      SELECT o_orderstatus, o_orderpriority,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM orders
      GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""),
    (s, d) =>
      Tables.orders(s, d)
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(dsum(col("o_totalprice")).as("total"), count(lit(1)).as("n"))
        .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority")),
  )

  /** Left-semi + left-anti joins (EXISTS / NOT EXISTS). */
  val semiAnti = GraftQuery(
    "q_semi_anti",
    Some("""
      SELECT c_mktsegment,
             COUNT(CASE WHEN EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 END) AS with_orders,
             COUNT(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey) THEN 1 END) AS without_orders
      FROM customer c
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d).select("o_custkey")
      val semi = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("with_orders"))
      val anti = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("without_orders"))
      c.select("c_mktsegment").distinct()
        .join(semi, Seq("c_mktsegment"), "left")
        .join(anti, Seq("c_mktsegment"), "left")
        .na.fill(0, Seq("with_orders", "without_orders"))
        .orderBy("c_mktsegment")
    },
  )

  /** Exact distinct-count per group (shuffle-heavy op; at scale this
    * is two-phase: partial distinct per partition then merge).
    */
  val distinctAgg = GraftQuery(
    "q_distinct_agg",
    Some("""
      SELECT o_orderpriority,
             COUNT(DISTINCT o_custkey) AS n_customers,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""),
    (s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          countDistinct(col("o_custkey")).as("n_customers"),
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total"))
        .orderBy("o_orderpriority"),
  )

  /** Exact interpolated percentiles per group (percentile_cont). */
  val percentiles = GraftQuery(
    "q_percentiles",
    Some("""
      SELECT c_mktsegment,
             ROUND(quantile_cont(c_acctbal, 0.5), 4) AS med_bal,
             ROUND(quantile_cont(c_acctbal, 0.9), 4) AS p90_bal
      FROM customer
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment"""),
    (s, d) =>
      Tables.customer(s, d)
        .groupBy("c_mktsegment")
        .agg(
          round(percentile(col("c_acctbal"), lit(0.5)), 4).as("med_bal"),
          round(percentile(col("c_acctbal"), lit(0.9)), 4).as("p90_bal"))
        .orderBy("c_mktsegment"),
  )

  /** TPC-H Q17 shape: small-quantity-order revenue — lineitems whose
    * quantity is below 20% of their part's average. Plan: the brand
    * filter broadcasts into lineitem FIRST (prunes the fact scan to
    * one brand's parts), the per-part average is computed over the
    * pruned rows only (same result — the filter selects whole
    * partkeys) and broadcast back. The correlated threshold is
    * multiplied through (5·qty·cnt < sum_qty) so both engines compare
    * exact decimals, never a divided average.
    */
  val q17 = GraftQuery(
    "q17_small_qty_revenue",
    Some("""
      WITH li AS (SELECT l_partkey, l_quantity, l_extendedprice
                  FROM lineitem JOIN part ON p_partkey = l_partkey
                  WHERE p_brand = 'Brand#3'),
      pa AS (SELECT l_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS sum_qty,
               COUNT(*) AS cnt
             FROM li GROUP BY l_partkey)
      SELECT COUNT(*) AS n_small,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 4)
               AS avg_yearly
      FROM li JOIN pa USING (l_partkey)
      WHERE 5 * CAST(l_quantity AS DECIMAL(18,2)) * cnt < sum_qty"""),
    (s, d) => {
      val bparts = broadcast(
        Tables.part(s, d).filter(col("p_brand") === "Brand#3").select("p_partkey"))
      val li = Tables.lineitem(s, d)
        .join(bparts, col("l_partkey") === col("p_partkey"))
        .select("l_partkey", "l_quantity", "l_extendedprice")
      val pa = li.groupBy("l_partkey")
        .agg(sum(dec2(col("l_quantity"))).cast("decimal(18,2)").as("sum_qty"),
          count(lit(1)).as("cnt"))
      li.join(broadcast(pa), Seq("l_partkey"))
        .filter(lit(5) * dec2(col("l_quantity")) * col("cnt") < col("sum_qty"))
        .agg(count(lit(1)).as("n_small"),
          round(dsum(col("l_extendedprice")) / 7.0, 4).as("avg_yearly"))
    },
  )

  /** TPC-H Q18 shape: large-volume customers — orders whose total
    * quantity exceeds 300. Plan: the HAVING aggregate is one partial
    * (map-side) shuffle on orderkey; its survivors are tiny, so they
    * broadcast into orders; top-100 via TakeOrderedAndProject, never a
    * global sort.
    */
  val q18 = GraftQuery(
    "q18_large_volume",
    Some("""
      WITH big AS (SELECT l_orderkey,
                     CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
                   FROM lineitem GROUP BY l_orderkey
                   HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice, sum_qty
      FROM big
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 100"""),
    (s, d) => {
      val big = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(dec2(col("l_quantity"))).as("sq"))
        .filter(col("sq") > 300)
        .select(col("l_orderkey"), col("sq").cast("double").as("sum_qty"))
      Tables.orders(s, d)
        .join(broadcast(big), col("o_orderkey") === col("l_orderkey"))
        .join(Tables.customer(s, d), col("c_custkey") === col("o_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
          "o_totalprice", "sum_qty")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    },
  )

  def all: Seq[GraftQuery] = Seq(
    q1, q3, q5, topCustomers, windowRunning, rankParts, rollupAgg,
    semiAnti, distinctAgg, percentiles, q17, q18,
  )
}

object OlapDefaults {
  /** Flagship query for the driver smoke check. */
  def entry(s: org.apache.spark.sql.SparkSession): DataFrame =
    Olap.q5.run(s, "/root/testdata/sf0.001")
}
