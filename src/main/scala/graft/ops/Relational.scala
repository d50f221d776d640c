package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reference-parity relational operators over the driver testdata schema.
  *
  * Each method mirrors one operator row of SURVEY.md §2 (cites are to
  * `/root/reference/etl.py`), re-expressed Spark-first over the TPC-H-ish
  * fixture tables (FIXTURES.md §B). All queries end in a deterministic
  * `orderBy` on a unique key so the DuckDB-oracle hash compare is
  * order-stable.
  */
object Relational {

  /** Exact, engine-portable SUM over a double column: cast to
    * DECIMAL(18,2) first so the sum is exact and order-independent
    * (identical in Spark and DuckDB regardless of partition/summation
    * order), then back to double with a fixed rounding. SURVEY §7.4 risk 2.
    */
  def exactSum(c: Column, scale: Int = 2): Column =
    round(sum(c.cast("decimal(18,2)")).cast("double"), scale)

  /** D1 + C3 + B4 (`etl.py:159-191`): multi-way LEFT equi-join of the fact
    * to its dimensions, WHERE every right-side key IS NOT NULL (so
    * Catalyst's `EliminateOuterJoin` rewrites to inner), with an aliased
    * projection renaming source columns to model names.
    *
    * Scale notes: lineitem⋈orders is a genuine big-big join — shuffle
    * hash/sort-merge on the key, AQE decides; part/supplier/customer/
    * nation are dimension-sized → auto-broadcast. No driver-side work.
    */
  def starJoin(lineitem: DataFrame, orders: DataFrame, part: DataFrame,
               supplier: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame = {
    val joined = lineitem
      .join(orders, lineitem("l_orderkey") === orders("o_orderkey"), "left")
      .join(part, lineitem("l_partkey") === part("p_partkey"), "left")
      .join(supplier, lineitem("l_suppkey") === supplier("s_suppkey"), "left")
      .join(customer, orders("o_custkey") === customer("c_custkey"), "left")
      .join(nation, customer("c_nationkey") === nation("n_nationkey"), "left")
      .where(orders("o_orderkey").isNotNull && part("p_partkey").isNotNull &&
        supplier("s_suppkey").isNotNull && customer("c_custkey").isNotNull &&
        nation("n_nationkey").isNotNull)
    joined.select(
      lineitem("l_orderkey").as("order_key"),
      lineitem("l_linenumber").as("line_number"),
      date_format(orders("o_orderdate"), "yyyy-MM-dd").as("order_date"),
      orders("o_orderstatus").as("order_status"),
      orders("o_orderpriority").as("order_priority"),
      part("p_name").as("part_name"),
      part("p_brand").as("brand"),
      supplier("s_name").as("supplier_name"),
      customer("c_name").as("customer_name"),
      customer("c_mktsegment").as("market_segment"),
      nation("n_name").as("nation_name"),
      lineitem("l_quantity").as("quantity"),
      lineitem("l_extendedprice").as("extended_price"),
      lineitem("l_returnflag").as("return_flag"),
      lineitem("l_linestatus").as("line_status")
    ).orderBy("order_key", "line_number")
  }

  /** E1 (`etl.py:202-213`): hash GROUP BY with multiple SUMs collapsing a
    * finer grain, incl. the reference's string→numeric cast made explicit
    * (ANSI-safe). Partial+final HashAggregate; one shuffle on the group keys.
    */
  def groupBySum(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag", "l_linestatus").agg(
      exactSum(col("l_quantity")).as("sum_qty"),
      exactSum(col("l_extendedprice")).as("sum_price"),
      round(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("double"), 2).as("sum_revenue"),
      count(lit(1)).as("n_rows")
    ).orderBy("l_returnflag", "l_linestatus")

  /** E1 + H3 + D2 (`etl.py:194-221`): aggregate two per-entity tables to a
    * shared grain, then join the aggregates back through a dimension on a
    * *derived* lower-cased expression key plus a second key column —
    * mirrors `lower(td.city)=lower(lp.city) AND td.state_code=lp.state_code`.
    */
  def aggJoinBack(customer: DataFrame, supplier: DataFrame, nation: DataFrame): DataFrame = {
    val custAgg = customer.groupBy("c_nationkey").agg(
      exactSum(col("c_acctbal")).as("cust_balance"),
      count(lit(1)).as("n_customers"))
    val suppAgg = supplier.groupBy("s_nationkey").agg(
      exactSum(col("s_acctbal")).as("supp_balance"),
      count(lit(1)).as("n_suppliers"))
    // derive a lower() name key on both sides via the nation dim.
    // Static broadcast hints: nation and the per-nation aggregates are
    // bounded by |nation| rows, so the build sides are declared up front
    // rather than discovered by AQE stage materialization. At sf0.1 the
    // query's wall time is dominated by fixed per-stage setup either way
    // (~3s cold, constant in data size — vanishes at real scale); the
    // hints exist to pin the correct 100 TB plan: two shuffles for the
    // aggregations, every join broadcast, no sort-merge anywhere.
    val custByName = custAgg.join(broadcast(nation),
        custAgg("c_nationkey") === nation("n_nationkey"))
      .select(lower(col("n_name")).as("nation_name"), col("n_regionkey").as("region_key"),
        col("cust_balance"), col("n_customers"))
    val suppByName = suppAgg.join(broadcast(nation),
        suppAgg("s_nationkey") === nation("n_nationkey"))
      .select(lower(col("n_name")).as("s_nation_name"), col("n_regionkey").as("s_region_key"),
        col("supp_balance"), col("n_suppliers"))
    custByName.join(broadcast(suppByName),
      custByName("nation_name") === suppByName("s_nation_name") &&
        custByName("region_key") === suppByName("s_region_key"), "inner")
      .select(col("nation_name"), col("region_key"), col("cust_balance"),
        col("n_customers"), col("supp_balance"), col("n_suppliers"))
      .orderBy("nation_name")
  }

  /** C1 + C2 (`etl.py:110-115,144-148`): sentinel-value rejection plus
    * IS NOT NULL filter, both pushed down to the parquet scan.
    */
  def filterSentinel(orders: DataFrame): DataFrame =
    orders.filter(col("o_orderstatus") =!= "P" && col("o_custkey").isNotNull)
      .select(col("o_orderkey").as("order_key"), col("o_orderstatus").as("order_status"),
        col("o_custkey").as("customer_key"))
      .orderBy("order_key")

  /** F1 (`etl.py:123`): regexp_replace normalizing a family of bad values
    * to a sentinel, with an anchored alternation pattern.
    */
  def regexpNormalize(part: DataFrame): DataFrame =
    part.select(col("p_partkey").as("part_key"), col("p_type").as("part_type"),
      regexp_replace(col("p_type"), "^PROMO.*|^ECONOMY.*", "NA").as("type_norm"))
      .orderBy("part_key")

  /** F2 + F3 (`etl.py:131-132`): split + element access + trim, including
    * the null-producing path when the token is absent. The reference's
    * PySpark `getItem(1)` yielded null for missing tokens; under Spark 4
    * ANSI mode that is an error, so `get()` (null on invalid index) is the
    * behavior-compatible form — SURVEY §7.4 risk 1/3.
    */
  def splitParts(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey").as("part_key"),
      trim(get(split(col("p_name"), " "), lit(0))).as("name_head"),
      trim(get(split(col("p_name"), " "), lit(1))).as("name_tail"),
      get(split(col("p_name"), ","), lit(1)).as("missing_token")
    ).orderBy("part_key")

  /** Window top-k (§2.10): rank rows per group, keep k — the top-3 orders
    * per customer by total price. One shuffle on the partition key; ties
    * broken deterministically by order key.
    */
  def windowTopK(orders: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("o_custkey").as("customer_key"), col("rnk"),
        col("o_orderkey").as("order_key"), col("o_totalprice").as("total_price"))
      .orderBy("customer_key", "rnk")
  }

  /** CUBE grouping-sets aggregate (§2.10 extension surface). */
  def cubeAgg(lineitem: DataFrame): DataFrame =
    lineitem.cube("l_returnflag", "l_linestatus").agg(
      exactSum(col("l_quantity")).as("sum_qty"),
      count(lit(1)).as("n_rows")
    ).orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Exact COUNT(DISTINCT) per group (expands to a two-phase aggregate;
    * for 100 TB cardinality estimation use approx_count_distinct — kept
    * exact here for the oracle).
    */
  def countDistinct(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag").agg(
      count_distinct(col("l_partkey")).as("n_parts"),
      count_distinct(col("l_suppkey")).as("n_suppliers"),
      count(lit(1)).as("n_rows")
    ).orderBy("l_returnflag")

  /** Aggregate-function breadth pack: min_by/max_by with a UNIQUE
    * criterion (composite key — arbitrary-tie arg_max is
    * nondeterministic and would never hash-match), boolean aggregates,
    * and second-moment statistics rounded past their accumulation-order
    * noise floor.
    */
  def aggPack(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag").agg(
      bool_and(col("l_quantity") > 0).as("all_positive"),
      bool_or(col("l_quantity") > 49).as("any_large"),
      round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
      round(stddev_samp(col("l_quantity")), 4).as("qty_stddev"),
      round(var_samp(col("l_quantity")), 4).as("qty_var"),
      round(covar_samp(col("l_quantity"), col("l_discount")), 6).as("qty_disc_covar")
    ).orderBy("l_returnflag")

  /** min_by / max_by with a genuinely-unique criterion (o_orderkey) —
    * arg extremes with arbitrary tie-break would never hash-match, so
    * the criterion must be a key (the synthetic lineitem has duplicate
    * (orderkey, linenumber) pairs; orders is the keyed table).
    */
  def minMaxBy(orders: DataFrame): DataFrame =
    orders.groupBy("o_orderpriority").agg(
      max_by(col("o_totalprice"), col("o_orderkey")).as("price_of_latest_order"),
      min_by(col("o_totalprice"), col("o_orderkey")).as("price_of_earliest_order"),
      max(col("o_orderkey")).as("latest_order"),
      count(lit(1)).as("n_orders")
    ).orderBy("o_orderpriority")

  /** Key-skew diagnostics: the group-size distribution (count of keys
    * per group size) for a prospective shuffle key — the measurement
    * that decides whether a join/aggregation on this key needs salting,
    * AQE skew handling, or a broadcast rewrite BEFORE burning a 100 TB
    * shuffle on it. Two cascaded aggregations; the second operates on
    * one row per distinct key, and its output is at most the number of
    * distinct group sizes (tiny).
    */
  def skewHistogram(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("group_size"))
      .groupBy("group_size").agg(count(lit(1)).as("n_keys"))
      .orderBy("group_size")

  /** Column profiling: per-column row/null/distinct counts and value
    * bounds for a table — the data-quality sweep run before any pipeline
    * ingests a new source. One scan, but the three exact
    * COUNT(DISTINCT)s trigger Catalyst's Expand rewrite (~4× shuffle
    * volume); at 100 TB swap them for approx_count_distinct / the HLL
    * sketch, which fuse into a genuine single-pass aggregate.
    */
  def profileOrders(orders: DataFrame): DataFrame = {
    orders.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_custkey").isNull, 1L).otherwise(0L)).as("null_custkey"),
      count_distinct(col("o_custkey")).as("distinct_custkey"),
      count_distinct(col("o_orderstatus")).as("distinct_status"),
      count_distinct(col("o_orderpriority")).as("distinct_priority"),
      min(col("o_orderkey")).as("min_orderkey"),
      max(col("o_orderkey")).as("max_orderkey"),
      round(min(col("o_totalprice")), 2).as("min_price"),
      round(max(col("o_totalprice")), 2).as("max_price"),
      date_format(min(col("o_orderdate")), "yyyy-MM-dd").as("min_date"),
      date_format(max(col("o_orderdate")), "yyyy-MM-dd").as("max_date"))
  }

  /** The 100 TB profiling form the exact sweeps' scaladocs point at:
    * approx_count_distinct (HLL++) and approx_percentile (mergeable
    * quantile summaries) fuse into ONE single-pass hash aggregate — no
    * Expand rewrite, no per-group sort, state size independent of
    * cardinality. Approximate by construction → rows-only driver check;
    * the error envelopes vs the exact twins are pinned in
    * RelationalSpec.
    */
  def approxProfile(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag").agg(
      count(lit(1)).as("n_rows"),
      approx_count_distinct(col("l_partkey")).as("approx_parts"),
      approx_count_distinct(col("l_suppkey")).as("approx_suppliers"),
      round(percentile_approx(col("l_quantity"), lit(0.5), lit(10000)), 4)
        .as("approx_median_qty"),
      round(percentile_approx(col("l_quantity"), lit(0.9), lit(10000)), 4)
        .as("approx_p90_qty"))
      .orderBy("l_returnflag")

  /** The [[approxProfile]] estimates AUDITED against their exact twins
    * in one result: per group, the exact aggregates plus a pass/fail
    * boolean per estimate (HLL distinct counts within ±15% — 3× the
    * default 5% rsd — and approx percentiles within ±2 quantity units,
    * generous for accuracy 10000 over this value domain). The booleans
    * put the approximate path's ERROR CONTRACT under the DuckDB oracle
    * (`q_approx_profile_bounds`): the oracle computes the exact columns
    * and asserts every bound TRUE, so a hash match certifies both the
    * exact arithmetic and that the estimators kept their envelopes —
    * the strongest oracle an approximate-by-contract operator admits
    * (the estimates themselves stay rows-only in `q_approx_profile`).
    * This is also the production shape of an estimator-regression
    * audit: run it on a sampled slice beside the full approx profile.
    */
  def approxProfileBounds(lineitem: DataFrame): DataFrame = {
    val approx = approxProfile(lineitem)
    val exact = lineitem.groupBy("l_returnflag").agg(
      count_distinct(col("l_partkey")).as("exact_parts"),
      count_distinct(col("l_suppkey")).as("exact_suppliers"),
      round(percentile(col("l_quantity"), lit(0.5)), 4).as("exact_median_qty"),
      round(percentile(col("l_quantity"), lit(0.9)), 4).as("exact_p90_qty"))
    approx.join(exact, "l_returnflag")
      .select(
        col("l_returnflag"), col("n_rows"),
        col("exact_parts"), col("exact_suppliers"),
        col("exact_median_qty"), col("exact_p90_qty"),
        (abs(col("approx_parts") - col("exact_parts"))
          <= col("exact_parts") * 0.15).as("parts_ok"),
        (abs(col("approx_suppliers") - col("exact_suppliers"))
          <= col("exact_suppliers") * 0.15).as("suppliers_ok"),
        (abs(col("approx_median_qty") - col("exact_median_qty")) <= 2.0)
          .as("median_ok"),
        (abs(col("approx_p90_qty") - col("exact_p90_qty")) <= 2.0).as("p90_ok"))
      .orderBy("l_returnflag")
  }

  /** Exact percentiles (linear interpolation — same definition as
    * DuckDB's quantile_cont) per group. Exact percentile sorts the
    * group; at 100 TB swap in approx_percentile with a bounded error.
    */
  def percentiles(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag").agg(
      round(percentile(col("l_quantity"), lit(0.5)), 4).as("median_qty"),
      round(percentile(col("l_quantity"), lit(0.9)), 4).as("p90_qty"),
      count(lit(1)).as("n_rows")
    ).orderBy("l_returnflag")

  /** Global ORDER BY + LIMIT top-N (TakeOrderedAndProject — no full
    * sort materialization; each partition keeps N, driver merges N·P).
    */
  def topNOrders(orders: DataFrame, n: Int = 10): DataFrame =
    orders.select(col("o_orderkey").as("order_key"), col("o_totalprice").as("total_price"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(n)

  /** PIVOT: line statuses to columns, decimal-exact sums in the cells.
    * Pivot values are enumerated explicitly — at scale, never let Spark
    * run the implicit distinct-collect to discover them.
    */
  def pivotLineStatus(lineitem: DataFrame): DataFrame =
    lineitem.groupBy("l_returnflag")
      .pivot("l_linestatus", Seq("F", "O"))
      .agg(exactSum(col("l_quantity")))
      .orderBy("l_returnflag")

  /** ROLLUP grouping-sets aggregate (§2.10 extension surface). */
  def rollupAgg(lineitem: DataFrame): DataFrame =
    lineitem.rollup("l_returnflag", "l_linestatus").agg(
      exactSum(col("l_quantity")).as("sum_qty"),
      count(lit(1)).as("n_rows")
    ).orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** UNION (distinct) of two conformed projections. */
  def unionNames(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_name").as("name"))
      .union(supplier.select(col("s_name").as("name")))
      .distinct()
      .orderBy("name")

  /** DISTINCT projection. */
  def distinctSegments(customer: DataFrame): DataFrame =
    customer.select(col("c_mktsegment").as("market_segment")).distinct()
      .orderBy("market_segment")

  /** INTERSECT (distinct) of two key projections. */
  def intersectKeys(customer: DataFrame, supplier: DataFrame): DataFrame =
    customer.select(col("c_nationkey").as("nation_key"))
      .intersect(supplier.select(col("s_nationkey").as("nation_key")))
      .orderBy("nation_key")

  /** EXCEPT (distinct): customers who placed orders, minus the
    * BUILDING-segment customer keys. The left side carries heavy
    * multiplicity (a customer places many orders) and the difference
    * is non-empty at every test SF, so the oracle match certifies
    * EXCEPT's dedup-on-survivors semantics on real rows — the prior
    * customer-nations-minus-supplier-nations pair matched on an EMPTY
    * result at the test SFs, the weakest possible instrument.
    */
  def exceptKeys(orders: DataFrame, customer: DataFrame): DataFrame =
    orders.select(col("o_custkey").as("customer_key"))
      .except(customer.filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey").as("customer_key")))
      .orderBy("customer_key")

  /** Correlated scalar subqueries (SQL path): orders priced above their
    * customer's average. The comparison is done entirely in integer
    * cents (price·count > sum-of-cents) so the row membership is exact
    * and engine-portable — a float average comparison could flip rows at
    * ties (SURVEY §7.4 risk 2).
    */
  def scalarSubquery(spark: SparkSession, orders: DataFrame): DataFrame = {
    orders.createOrReplaceTempView("orders_sq")
    spark.sql("""
      SELECT o.o_orderkey AS order_key, o.o_custkey AS customer_key,
             o.o_totalprice AS total_price
      FROM orders_sq o
      WHERE CAST(round(o.o_totalprice * 100) AS BIGINT) *
            (SELECT COUNT(*) FROM orders_sq o2 WHERE o2.o_custkey = o.o_custkey)
          > (SELECT CAST(SUM(CAST(round(o2.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             FROM orders_sq o2 WHERE o2.o_custkey = o.o_custkey)
      ORDER BY order_key""")
  }

  /** Correlated LATERAL join (SQL surface): per outer row, a dependent
    * subquery with its own ORDER BY + LIMIT — "top-2 customers per
    * nation" phrased the way an analyst writes it. Catalyst decorrelates
    * the lateral subquery into a join + per-key limit, so the executed
    * plan is the same shape as the window/custom top-k forms (no
    * nested-loop re-execution per outer row) — worth knowing when users
    * port LATERAL-heavy warehouse SQL.
    */
  def lateralTopPerGroup(spark: SparkSession, customer: DataFrame,
                         nation: DataFrame): DataFrame = {
    customer.createOrReplaceTempView("graft_lat_customer")
    nation.createOrReplaceTempView("graft_lat_nation")
    spark.sql("""
      SELECT n.n_name AS nation_name, t.customer_name, t.balance
      FROM graft_lat_nation n,
      LATERAL (
        SELECT c_name AS customer_name, c_acctbal AS balance
        FROM graft_lat_customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_name LIMIT 2) t
      ORDER BY nation_name, balance DESC, customer_name""")
  }

  /** Calendar/date function pack over the order date: component
    * extraction, month arithmetic (end-of-month clamping), truncation.
    */
  def dateFunctions(orders: DataFrame): DataFrame = {
    val d = col("o_orderdate").cast("date")
    orders.select(
      col("o_orderkey").as("order_key"),
      year(d).as("order_year"),
      quarter(d).as("order_quarter"),
      month(d).as("order_month"),
      dayofmonth(d).as("order_day"),
      date_format(add_months(d, 3), "yyyy-MM-dd").as("plus_3_months"),
      date_format(last_day(d), "yyyy-MM-dd").as("month_end"),
      date_format(trunc(d, "MM"), "yyyy-MM-dd").as("month_start"),
      datediff(d, to_date(lit("1992-01-01"))).as("days_since_1992")
    ).orderBy("order_key")
  }

  /** Analytic window-function pack: ranking family, offsets, ntile and
    * distribution functions over one window spec (one shuffle + sort,
    * shared by all of them — Catalyst collapses same-spec windows).
    */
  def windowPack(orders: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders.select(
      col("o_custkey").as("customer_key"),
      col("o_orderkey").as("order_key"),
      col("o_totalprice").as("total_price"),
      rank().over(w).as("rnk"),
      dense_rank().over(w).as("dense_rnk"),
      ntile(4).over(w).as("quartile"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      first(col("o_orderkey")).over(w).as("best_order"),
      round(percent_rank().over(w), 6).as("pct_rank"),
      round(cume_dist().over(w), 6).as("cume")
    ).orderBy("customer_key", "order_key")
  }

  /** FULL OUTER join of the per-nation customer and supplier rollups —
    * unlike the inner aggJoinBack, nations present on only one side
    * survive with NULLs (the reconciliation report shape). Coalesced key
    * so the output key is total.
    */
  def fullOuterBalances(customer: DataFrame, supplier: DataFrame): DataFrame = {
    val ca = customer.groupBy(col("c_nationkey").as("nk"))
      .agg(exactSum(col("c_acctbal")).as("cust_balance"),
        count(lit(1)).as("n_customers"))
    val sa = supplier.groupBy(col("s_nationkey").as("snk"))
      .agg(exactSum(col("s_acctbal")).as("supp_balance"),
        count(lit(1)).as("n_suppliers"))
    ca.join(sa, ca("nk") === sa("snk"), "full_outer")
      .select(coalesce(col("nk"), col("snk")).as("nation_key"),
        col("cust_balance"), col("n_customers"),
        col("supp_balance"), col("n_suppliers"))
      .orderBy(col("nation_key").asc_nulls_first)
  }

  /** Cross join of two tiny dimensions — the deliberate-cartesian
    * surface (only ever sane when both sides are dimension-sized; the
    * planner broadcasts one side).
    */
  def crossRegionSegments(region: DataFrame, customer: DataFrame): DataFrame = {
    val segs = customer.select(col("c_mktsegment").as("market_segment")).distinct()
    region.select(col("r_regionkey").as("region_key"), col("r_name").as("region_name"))
      .crossJoin(segs)
      .orderBy("region_key", "market_segment")
  }

  /** Wide→long reshape (unpivot/melt): numeric part attributes become
    * (attribute, value) rows — the normalization step before per-metric
    * aggregation over heterogeneous measures.
    */
  def unpivotPart(part: DataFrame): DataFrame =
    part.select(col("p_partkey"), col("p_size").cast("double").as("size"),
        col("p_retailprice").cast("double").as("retail_price"))
      .unpivot(Array(col("p_partkey")), Array(col("size"), col("retail_price")),
        "attribute", "value")
      .select(col("p_partkey").as("part_key"), col("attribute"),
        round(col("value"), 2).as("value"))
      .orderBy("part_key", "attribute")

  /** Explicit GROUPING SETS with grouping_id: per-flag and per-status
    * marginals plus the grand total in ONE pass (what rollup/cube
    * generalize); gid disambiguates the NULL-as-aggregate rows from
    * genuine NULL keys.
    */
  def groupingSets(lineitem: DataFrame): DataFrame =
    lineitem
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(
        grouping_id().cast("int").as("gid"),
        exactSum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("gid"), col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  /** ROWS-frame window pack: running totals and bounded sliding frames
    * (2-preceding / 1-following) — the moving-aggregate surface. One
    * shared partition+sort, decimal-exact sums inside the frames.
    */
  def windowFrames(orders: DataFrame): DataFrame = {
    val base = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val m3 = base.rowsBetween(-2, 0)
    val ahead = base.rowsBetween(0, 1)
    val dec = col("o_totalprice").cast("decimal(18,2)")
    orders.select(
      col("o_custkey").as("customer_key"),
      col("o_orderkey").as("order_key"),
      round(sum(dec).over(run).cast("double"), 2).as("running_total"),
      round(sum(dec).over(m3).cast("double"), 2).as("moving_sum3"),
      count(lit(1)).over(m3).as("n_in_frame"),
      round(max(col("o_totalprice")).over(ahead), 2).as("max_next2"))
      .orderBy("order_key")
  }

  /** Higher-order array-function pack over tokenized names: transform /
    * filter / exists / forall / sort / slice / fold — the list-algebra
    * surface (all codegen'd built-ins, engine-portable → oracle).
    */
  def arrayPack(part: DataFrame): DataFrame = {
    val toks = split(col("p_name"), " ")
    part.select(
      col("p_partkey").as("part_key"),
      size(toks).as("n_tokens"),
      size(filter(toks, t => length(t) > 4)).as("n_long_tokens"),
      exists(toks, t => length(t) <= 3).as("has_short"),
      forall(toks, t => length(t) >= 2).as("all_ge2"),
      get(sort_array(toks), lit(0)).as("first_sorted"),
      array_join(slice(sort_array(toks), 1, 3), "-").as("sorted_head3"),
      aggregate(transform(toks, t => length(t)), lit(0), (a, b) => a + b)
        .as("sum_token_lens"))
      .orderBy("part_key")
  }

  /** String-function pack incl. edit distance (the fuzzy-matching
    * primitive for entity resolution at scale).
    */
  def stringPack(part: DataFrame): DataFrame =
    part.select(
      col("p_partkey").as("part_key"),
      concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
      lpad(col("p_size").cast("string"), 4, "0").as("size_padded"),
      translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
      reverse(col("p_name")).as("name_rev"),
      repeat(col("p_brand"), 2).as("brand_x2"),
      substring(col("p_name"), 1, 3).as("name_left3"),
      instr(col("p_name"), " ").as("space_pos"),
      levenshtein(col("p_name"), lit("cold widget")).as("edit_dist")
    ).orderBy("part_key")

  /** Conditional / null-handling pack + a MapType column carried through
    * the projection (nested-type surface).
    */
  def conditionalPack(customer: DataFrame): DataFrame =
    customer.select(
      col("c_custkey").as("customer_key"),
      coalesce(nullif(col("c_mktsegment"), lit("MACHINERY")), lit("OTHER")).as("segment_norm"),
      greatest(col("c_acctbal"), lit(1000.0)).as("floor_bal"),
      least(col("c_acctbal"), lit(5000.0)).as("cap_bal"),
      when(col("c_acctbal") > 5000, "high")
        .when(col("c_acctbal") > 1000, "mid")
        .otherwise("low").as("tier"),
      element_at(map(lit("seg"), col("c_mktsegment")), "seg").as("seg_from_map")
    ).orderBy("customer_key")

  /** LEFT SEMI join (EXISTS): customers having at least one order. */
  def semiJoin(customer: DataFrame, orders: DataFrame): DataFrame =
    customer.join(orders, customer("c_custkey") === orders("o_custkey"), "left_semi")
      .select(col("c_custkey").as("customer_key"), col("c_name").as("customer_name"))
      .orderBy("customer_key")

  /** LEFT ANTI join (NOT EXISTS): orders with no lineitems. */
  def antiJoin(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders.join(lineitem, orders("o_orderkey") === lineitem("l_orderkey"), "left_anti")
      .select(col("o_orderkey").as("order_key"), col("o_orderstatus").as("order_status"))
      .orderBy("order_key")
}
