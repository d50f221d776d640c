package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the materialized-view pattern
  * that makes daily ETL affordable at 100 TB: keep a stored rollup
  * table, aggregate ONLY each new batch, and merge. Algebraic
  * aggregates compose exactly (counts and sums add, mins/maxes
  * combine), so the merged table is identical to a full recompute
  * without ever rescanning history — the same never-rescan contract
  * the sketch tables give approximate aggregates
  * ([[Sketches.dailyUserSketches]] is the distinct-count analog).
  *
  * Sums are carried as DECIMAL(18,6): double addition is
  * order-sensitive, so a double-summed rollup would drift from the
  * full recompute (and from the oracle) depending on partitioning;
  * decimal sums are exact and associative. Presentation rounds back to
  * double at the end.
  */
object Incremental {

  /** Per (day, event_type) algebraic rollup of an event batch — the
    * unit both the initial backfill and each incremental delta run.
    * One shuffle with map-side combine; the output is the storable
    * rollup table.
    */
  def dailyRollup(events: DataFrame): DataFrame =
    events.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,6)")).as("sum_value"),
        min(col("value")).as("min_value"),
        max(col("value")).as("max_value"))

  /** Merge a stored rollup with a delta rollup (or several — union any
    * number of batch rollups). Re-keying is a shuffle over ROLLUP ROWS
    * (days × types), not events: the whole point is that history is
    * never rescanned. Identical to a full recompute over the combined
    * events (IncrementalSpec pins equality, and the driver oracle
    * recomputes from scratch).
    */
  def mergeRollup(stored: DataFrame, delta: DataFrame): DataFrame =
    stored.unionByName(delta)
      .groupBy("day", "event_type")
      .agg(
        sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).as("sum_value"),
        min(col("min_value")).as("min_value"),
        max(col("max_value")).as("max_value"))

  /** Presentation form for the driver contract: stable column shapes
    * (day as string, decimal folded back to a rounded double).
    */
  def present(rollup: DataFrame): DataFrame =
    rollup.select(
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      col("event_type"),
      col("n_events").cast("long").as("n_events"),
      round(col("sum_value").cast("double"), 4).as("sum_value"),
      round(col("min_value"), 4).as("min_value"),
      round(col("max_value"), 4).as("max_value"))
      .orderBy("day", "event_type")
}
