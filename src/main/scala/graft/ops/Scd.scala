package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension type-2 merge — the batch-ETL operator the
  * reference's star-schema pipeline stops short of (its dimensions are
  * rebuilt from scratch each run; see `/root/reference/etl.py:64-130`):
  * apply an update batch to a versioned dimension, closing changed
  * rows' validity windows and opening new versions, while history rows
  * pass through untouched.
  *
  * Scale design: ONE full-outer join on the dimension key decides every
  * row's fate (close / reopen / pass-through / insert); the four
  * outcome branches are projections of that join unioned back together
  * — no per-row driver logic, no window over the whole dimension. At
  * 100 TB the join shuffles on the key (or stays exchange-free on a
  * bucketed dimension table), and null-safe comparison (`<=>`) makes
  * change detection exact for nullable tracked columns.
  */
object Scd {

  /** `current` must carry `key`, `tracked` columns, and string-typed
    * `valid_from` / `valid_to` (null `valid_to` = open row). `updates`
    * carries `key` + `tracked`. Emits the merged dimension: closed
    * history (untouched), rows closed by this batch (`valid_to` =
    * `batchDate`), new versions and brand-new keys (`valid_from` =
    * `batchDate`, open), and unchanged open rows.
    *
    * PRECONDITION (enforced): at most ONE update row per key — an
    * update batch is "the state of each key as of `batchDate`", and a
    * duplicate key would multiply through the full-outer join into a
    * corrupted dimension. Enforced in-plan (count per key +
    * `assert_true`), so the merge stays lazy and violations fail the
    * job at execution time naming the offending key, instead of
    * silently emitting inflated history.
    */
  def scd2Merge(current: DataFrame, updates: DataFrame, key: String,
                tracked: Seq[String], batchDate: String): DataFrame = {
    val open = current.filter(col("valid_to").isNull)
    val closedHistory = current.filter(col("valid_to").isNotNull)
    val u0 = updates.select(
      col(key).as("u_key") +: tracked.map(c => col(c).as(s"u_$c")): _*)
    val keyCounts = u0.groupBy(col("u_key")).agg(count(lit(1)).as("u_cnt"))
    val u = u0.join(keyCounts, Seq("u_key"))
      .withColumn("_dup_chk", assert_true(col("u_cnt") === 1,
        concat(lit("scd2Merge: more than one update row for key "),
          col("u_key").cast("string"))))
      .filter(col("_dup_chk").isNull) // always true; keeps the check referenced
      .drop("_dup_chk", "u_cnt")
    val joined = open.join(u, col(key) === col("u_key"), "full_outer")
    val differs = tracked.map(c => !(col(c) <=> col(s"u_$c"))).reduce(_ || _)

    // every outcome is a projection of the SAME joined row, so emit all
    // of them from ONE pass with a conditional explode (0–2 rows per
    // input) — a per-branch filter+union would re-scan and re-join the
    // dimension once per outcome class
    def mkRow(k: Column, vals: Seq[Column], from: Column, to: Column): Column = {
      val named: Seq[Column] = vals.zip(tracked).map { case (c, n) => c.as(n) }
      struct((k.as(key) +: named) ++
        Seq(from.as("valid_from"), to.as("valid_to")): _*)
    }
    val closedRow = mkRow(col(key), tracked.map(col),
      col("valid_from"), lit(batchDate))
    val reopenRow = mkRow(col("u_key"), tracked.map(c => col(s"u_$c")),
      lit(batchDate), lit(null).cast("string"))
    val keepRow = mkRow(col(key), tracked.map(col),
      col("valid_from"), col("valid_to"))
    val outcome = when(col(key).isNull, array(reopenRow)) // brand-new key
      .when(col("u_key").isNull || !differs, array(keepRow)) // untouched
      .otherwise(array(closedRow, reopenRow)) // changed: close + reopen
    val merged = joined.select(explode(outcome).as("r")).select(col("r.*"))

    closedHistory.select(merged.columns.map(col): _*)
      .unionByName(merged)
      .orderBy(key, "valid_from")
  }
}
