package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.regionSales(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (Relational.pricingSummary _),
    "q02_top_revenue"     -> (Relational.topRevenue _),
    "q03_segment_revenue" -> (Relational.segmentRevenue _),
    "q04_region_sales"    -> (Relational.regionSales _),
    "q05_order_priority"  -> (Relational.orderPriority _),
    "q06_selective_sum"   -> (Relational.selectiveSum _),
    "q07_cust_top_orders" -> (Relational.custTopOrders _),
    "q08_segment_distinct" -> (Relational.segmentDistinct _),
    "q09_idle_customers"  -> (Relational.idleCustomers _),
    "q10_rollup_sales"    -> (Relational.rollupSales _),
    "q11_part_type_topk"  -> (Relational.partTypeTopK _),
  )

  /** DuckDB-runnable oracle SQL per query (same parquet tables).
    * Column aliases MUST match the Spark side exactly (SURVEY §5). */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS sum_disc_price,
        | round(sum(l_extendedprice*(1.0-l_discount)*(1.0+l_tax)),2) AS sum_charge,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_extendedprice),4) AS avg_price,
        | round(avg(l_discount),4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q02_top_revenue" ->
      """WITH rev AS (
        | SELECT l_orderkey, round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        | FROM lineitem GROUP BY l_orderkey)
        |SELECT o_orderkey, o_orderdate, revenue
        |FROM rev JOIN orders ON l_orderkey = o_orderkey
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,
    "q03_segment_revenue" ->
      """SELECT o_orderkey, o_orderdate,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue
        |FROM customer JOIN orders ON c_custkey = o_custkey
        | JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        | AND o_orderdate < TIMESTAMP '1998-01-01'
        | AND l_shipdate > TIMESTAMP '1998-01-01'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey LIMIT 20""".stripMargin,
    "q04_region_sales" ->
      """SELECT r_name, n_name,
        | round(sum(l_extendedprice*(1.0-l_discount)),2) AS revenue,
        | count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin,
    "q05_order_priority" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1997-01-01'
        | AND EXISTS (SELECT 1 FROM lineitem
        |   WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
        |GROUP BY o_orderpriority""".stripMargin,
    "q06_selective_sum" ->
      """SELECT round(sum(l_extendedprice*l_discount),2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        | AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND l_discount BETWEEN 0.05 AND 0.07
        | AND l_quantity < 24""".stripMargin,
    "q07_cust_top_orders" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) t WHERE rn <= 3""".stripMargin,
    "q08_segment_distinct" ->
      """SELECT c_mktsegment,
        | count(DISTINCT c_nationkey) AS n_nations,
        | count(*) AS n_cust,
        | round(sum(c_acctbal),2) AS sum_acctbal
        |FROM customer GROUP BY c_mktsegment""".stripMargin,
    "q09_idle_customers" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000.0)""".stripMargin,
    "q10_rollup_sales" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_price,
        | count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,
    "q11_part_type_topk" ->
      """SELECT p_type, p_partkey, p_brand, p_retailprice, rn FROM (
        | SELECT p_type, p_partkey, p_brand, p_retailprice,
        |  row_number() OVER (PARTITION BY p_type
        |    ORDER BY p_retailprice DESC, p_partkey) AS rn
        | FROM part) t WHERE rn <= 2""".stripMargin,
  )
}
