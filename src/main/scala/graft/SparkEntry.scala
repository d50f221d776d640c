package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 has a `queries` entry
  * (Spark impl over `$sfDir/<table>.parquet`) and, where ANSI-SQL
  * expressible, an `oracleSql` twin the driver runs in DuckDB over the
  * same parquet files. Column names and value formats are aligned
  * engine-to-engine (decimal-exact sums, string-formatted dates,
  * deterministic ORDER BY) so the hash compare is stable.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val d = "/root/testdata/sf0.001"
    Relational.starJoin(
      Tables.lineitem(spark, d), Tables.orders(spark, d), Tables.part(spark, d),
      Tables.supplier(spark, d), Tables.customer(spark, d), Tables.nation(spark, d))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_star_join" -> ((s, d) => Relational.starJoin(
      Tables.lineitem(s, d), Tables.orders(s, d), Tables.part(s, d),
      Tables.supplier(s, d), Tables.customer(s, d), Tables.nation(s, d))),
    "q_groupby_sum" -> ((s, d) => Relational.groupBySum(Tables.lineitem(s, d))),
    "q_agg_join_back" -> ((s, d) => Relational.aggJoinBack(
      Tables.customer(s, d), Tables.supplier(s, d), Tables.nation(s, d))),
    "q_filter_sentinel" -> ((s, d) => Relational.filterSentinel(Tables.orders(s, d))),
    "q_regexp_replace" -> ((s, d) => Relational.regexpNormalize(Tables.part(s, d))),
    "q_split_parts" -> ((s, d) => Relational.splitParts(Tables.part(s, d))),
    "q_sas_date" -> ((s, d) => Dates.sasDateConvert(Tables.lineitem(s, d))),
    "q_sas_date_udf" -> ((s, d) => Dates.sasDateConvert(Tables.lineitem(s, d), useUdf = true)),
    "q_window_topk" -> ((s, d) => Relational.windowTopK(Tables.orders(s, d))),
    "q_rollup" -> ((s, d) => Relational.rollupAgg(Tables.lineitem(s, d))),
    "q_union" -> ((s, d) => Relational.unionNames(Tables.customer(s, d), Tables.supplier(s, d))),
    "q_distinct" -> ((s, d) => Relational.distinctSegments(Tables.customer(s, d))),
    "q_semi_join" -> ((s, d) => Relational.semiJoin(Tables.customer(s, d), Tables.orders(s, d))),
    "q_anti_join" -> ((s, d) => Relational.antiJoin(Tables.orders(s, d), Tables.lineitem(s, d)))
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q_star_join" ->
      """SELECT l.l_orderkey AS order_key, l.l_linenumber AS line_number,
        |  strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
        |  o.o_orderstatus AS order_status, o.o_orderpriority AS order_priority,
        |  p.p_name AS part_name, p.p_brand AS brand,
        |  s.s_name AS supplier_name, c.c_name AS customer_name,
        |  c.c_mktsegment AS market_segment, n.n_name AS nation_name,
        |  l.l_quantity AS quantity, l.l_extendedprice AS extended_price,
        |  l.l_returnflag AS return_flag, l.l_linestatus AS line_status
        |FROM lineitem l
        |LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |LEFT JOIN part p ON l.l_partkey = p.p_partkey
        |LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
        |WHERE o.o_orderkey IS NOT NULL AND p.p_partkey IS NOT NULL
        |  AND s.s_suppkey IS NOT NULL AND c.c_custkey IS NOT NULL
        |  AND n.n_nationkey IS NOT NULL
        |ORDER BY order_key, line_number""".stripMargin,
    "q_groupby_sum" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_price,
        |  round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |    (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE), 2) AS sum_revenue,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q_agg_join_back" ->
      """WITH ca AS (
        |  SELECT c_nationkey,
        |    round(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS cust_balance,
        |    COUNT(*) AS n_customers
        |  FROM customer GROUP BY c_nationkey),
        |sa AS (
        |  SELECT s_nationkey,
        |    round(CAST(SUM(CAST(s_acctbal AS DECIMAL(18,2))) AS DOUBLE), 2) AS supp_balance,
        |    COUNT(*) AS n_suppliers
        |  FROM supplier GROUP BY s_nationkey),
        |cn AS (
        |  SELECT lower(n.n_name) AS nation_name, n.n_regionkey AS region_key,
        |    ca.cust_balance, ca.n_customers
        |  FROM ca JOIN nation n ON ca.c_nationkey = n.n_nationkey),
        |sn AS (
        |  SELECT lower(n.n_name) AS s_nation_name, n.n_regionkey AS s_region_key,
        |    sa.supp_balance, sa.n_suppliers
        |  FROM sa JOIN nation n ON sa.s_nationkey = n.n_nationkey)
        |SELECT cn.nation_name, cn.region_key, cn.cust_balance, cn.n_customers,
        |  sn.supp_balance, sn.n_suppliers
        |FROM cn JOIN sn ON cn.nation_name = sn.s_nation_name
        |  AND cn.region_key = sn.s_region_key
        |ORDER BY nation_name""".stripMargin,
    "q_filter_sentinel" ->
      """SELECT o_orderkey AS order_key, o_orderstatus AS order_status,
        |  o_custkey AS customer_key
        |FROM orders
        |WHERE o_orderstatus <> 'P' AND o_custkey IS NOT NULL
        |ORDER BY order_key""".stripMargin,
    "q_regexp_replace" ->
      """SELECT p_partkey AS part_key, p_type AS part_type,
        |  regexp_replace(p_type, '^PROMO.*|^ECONOMY.*', 'NA') AS type_norm
        |FROM part ORDER BY part_key""".stripMargin,
    "q_split_parts" ->
      """SELECT p_partkey AS part_key,
        |  trim(string_split(p_name, ' ')[1]) AS name_head,
        |  trim(string_split(p_name, ' ')[2]) AS name_tail,
        |  string_split(p_name, ',')[2] AS missing_token
        |FROM part ORDER BY part_key""".stripMargin,
    "q_sas_date" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_number,
        |  CAST(datediff('day', DATE '1960-01-01', CAST(l_shipdate AS DATE)) AS INTEGER) AS sas_days,
        |  CASE WHEN datediff('day', DATE '1960-01-01', CAST(l_shipdate AS DATE)) IS NULL
        |         OR datediff('day', DATE '1960-01-01', CAST(l_shipdate AS DATE)) = 0
        |    THEN NULL
        |    ELSE strftime(DATE '1960-01-01' + CAST(datediff('day', DATE '1960-01-01',
        |      CAST(l_shipdate AS DATE)) AS INTEGER), '%Y-%m-%d') END AS ship_date_iso
        |FROM lineitem ORDER BY order_key, line_number""".stripMargin,
    "q_sas_date_udf" ->
      """SELECT l_orderkey AS order_key, l_linenumber AS line_number,
        |  CAST(datediff('day', DATE '1960-01-01', CAST(l_shipdate AS DATE)) AS INTEGER) AS sas_days,
        |  CASE WHEN datediff('day', DATE '1960-01-01', CAST(l_shipdate AS DATE)) IS NULL
        |         OR datediff('day', DATE '1960-01-01', CAST(l_shipdate AS DATE)) = 0
        |    THEN NULL
        |    ELSE strftime(DATE '1960-01-01' + CAST(datediff('day', DATE '1960-01-01',
        |      CAST(l_shipdate AS DATE)) AS INTEGER), '%Y-%m-%d') END AS ship_date_iso
        |FROM lineitem ORDER BY order_key, line_number""".stripMargin,
    "q_window_topk" ->
      """SELECT o_custkey AS customer_key,
        |  CAST(row_number() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INTEGER) AS rnk,
        |  o_orderkey AS order_key, o_totalprice AS total_price
        |FROM orders
        |QUALIFY rnk <= 3
        |ORDER BY customer_key, rnk""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_qty,
        |  COUNT(*) AS n_rows
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
    "q_union" ->
      """SELECT c_name AS name FROM customer
        |UNION
        |SELECT s_name AS name FROM supplier
        |ORDER BY name""".stripMargin,
    "q_distinct" ->
      """SELECT DISTINCT c_mktsegment AS market_segment FROM customer
        |ORDER BY market_segment""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey AS customer_key, c_name AS customer_name
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY customer_key""".stripMargin,
    "q_anti_join" ->
      """SELECT o_orderkey AS order_key, o_orderstatus AS order_status
        |FROM orders o
        |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
        |ORDER BY order_key""".stripMargin
  )
}
