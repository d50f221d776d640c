package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Declarative data-quality check suite — the expectation-validation
  * step (pk uniqueness, enum domains, value ranges, referential
  * integrity) every production pipeline runs before publishing a
  * dataset. Emits one row per check: scanned rows, violation count,
  * pass flag.
  *
  * Scale shape: all scan-level checks against one table are fused into
  * a SINGLE aggregate pass (then unpivoted with `stack`), so the suite
  * costs one scan per table + one join per FK check — not one scan per
  * check. FK checks run as LEFT joins with a match marker (not
  * `left_anti`) so the total row count and the orphan count come out of
  * the same pass.
  */
object Quality {

  /** `stack`-unpivot the single-row aggregate `agg` into
    * (check_name, n_rows, n_violations, pass) rows.
    */
  private def unpivotChecks(agg: DataFrame, checkCols: Seq[String]): DataFrame = {
    // empty input → SUM aggregates yield NULL: that's zero violations
    // (vacuous pass), not an unknown — pinned in QualitySpec
    val stackArgs = checkCols.map(c => s"'$c', coalesce($c, 0L)").mkString(", ")
    agg.select(
      expr(s"stack(${checkCols.size}, $stackArgs) AS (check_name, n_violations)"),
      col("n_rows"))
  }

  /** The capstone-shaped suite over the TPC-H-ish tables: pk uniqueness
    * + sentinel-key + enum-domain + range checks (fused per table) and
    * two FK checks. `pass` is strict (zero violations).
    */
  def checkSuite(orders: DataFrame, lineitem: DataFrame,
                 customer: DataFrame): DataFrame = {
    val ordersAgg = orders.agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - countDistinct(col("o_orderkey"))).as("orders_pk_unique"),
      sum(when(col("o_custkey") <= 0, 1L).otherwise(0L)).as("orders_custkey_positive"),
      sum(when(!col("o_orderstatus").isin("O", "F", "P"), 1L).otherwise(0L))
        .as("orders_status_enum"),
      sum(when(col("o_totalprice") <= 0, 1L).otherwise(0L)).as("orders_price_positive"))
    val lineitemAgg = lineitem.agg(
      count(lit(1)).as("n_rows"),
      sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L))
        .as("lineitem_qty_range"),
      sum(when(!col("l_discount").between(0, 0.1), 1L).otherwise(0L))
        .as("lineitem_discount_range"))
    // FK checks: left join + match marker → total and orphans in one
    // pass. The target keys are DISTINCT'd first: they're pure existence
    // markers, and a duplicated target pk would otherwise multiply the
    // probe rows and corrupt both counts (pinned in QualitySpec).
    val liFk = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey")).distinct()
        .withColumn("m", lit(1)),
        col("l_orderkey") === col("o_orderkey"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("m").isNull, 1L).otherwise(0L)).as("lineitem_fk_orders"))
    val oFk = orders.select(col("o_custkey"))
      .join(customer.select(col("c_custkey")).distinct()
        .withColumn("m", lit(1)),
        col("o_custkey") === col("c_custkey"), "left")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("o_custkey").isNotNull && col("m").isNull, 1L).otherwise(0L))
          .as("orders_fk_customer"))
    unpivotChecks(ordersAgg, Seq("orders_pk_unique", "orders_custkey_positive",
        "orders_status_enum", "orders_price_positive"))
      .unionByName(unpivotChecks(lineitemAgg,
        Seq("lineitem_qty_range", "lineitem_discount_range")))
      .unionByName(unpivotChecks(liFk, Seq("lineitem_fk_orders")))
      .unionByName(unpivotChecks(oFk, Seq("orders_fk_customer")))
      .select(col("check_name"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0).as("pass"))
      .orderBy("check_name")
  }
}
