package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table (SURVEY §2.10): tumbling
  * windows and gap-based sessionization. Batch forms here; the streaming
  * twins live in `graft.streaming` (same semantics, `window()` +
  * watermark / flatMapGroupsWithState).
  *
  * Scale notes: both shuffle once on their natural key (window bucket /
  * user). Session assignment is a per-user sort inside the shuffle
  * partition — no driver-side state, arbitrarily many users scale out.
  * Timestamps are compared in microseconds (`unix_micros`) — second
  * truncation would mis-assign events exactly at a gap boundary.
  */
object Events {

  /** Tumbling 1-hour window aggregation: count + exact sum per
    * (window, event_type). Uses Spark's `window()` bucketing; the window
    * start is emitted as a formatted string for engine-portable compare.
    */
  def tumblingWindows(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type")).agg(
      count(lit(1)).as("n_events"),
      round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapMinutes`. Session ids
    * are per-user running sums of the new-session flag (classic
    * lag-gap-cumsum); output is one row per session with bounds.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    val prevTs = lag(col("ts"), 1).over(byUser)
    val newSession = when(prevTs.isNull ||
      unix_micros(col("ts")) - unix_micros(prevTs) > gapMicros, 1L).otherwise(0L)
    events
      .withColumn("session_id",
        sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id")).agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_start"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("session_end"),
        round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value"))
      .orderBy("user_id", "session_id")
  }
}
