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

  /** JSON extraction from the semi-structured `props` column:
    * `get_json_object` path lookup + typed cast, aggregated per event
    * type. The JSON never leaves the executors; schema stays dynamic.
    */
  def jsonExtract(events: DataFrame): DataFrame =
    events.select(col("event_id"), col("event_type"),
      get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("event_type").agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).cast("long").as("sum_k"),
        max(col("k")).as("max_k"))
      .orderBy("event_type")

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

  /** Time-series feature frame — the forecasting-prep step: per
    * (event_type, day), the daily count plus trailing-window and lag
    * features. The 7-day aggregate uses a RANGE frame over the day
    * NUMBER (value-based, so calendar gaps shrink the window — a ROWS
    * frame would silently span gaps); lags are row-based by definition.
    * One shuffle on event_type; every feature comes from the same
    * sorted window pass.
    */
  def dailyFeatures(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("day_num", datediff(col("day"), to_date(lit("2024-01-01"))))
    val ordered = Window.partitionBy(col("event_type")).orderBy(col("day_num"))
    val trailing7 = ordered.rangeBetween(-6, 0)
    daily.select(
      col("event_type"),
      date_format(col("day"), "yyyy-MM-dd").as("day"),
      col("n_events"),
      sum(col("n_events")).over(trailing7).as("n_7day"),
      count(lit(1)).over(trailing7).as("days_in_window"),
      lag(col("n_events"), 1).over(ordered).as("lag_1"),
      lag(col("n_events"), 7).over(ordered).as("lag_7"),
      (col("n_events") - lag(col("n_events"), 1).over(ordered)).as("delta_1"))
      .orderBy("event_type", "day")
  }

  /** Sliding (hopping) 1-hour windows with a 30-minute slide: every
    * event contributes to length/slide = 2 overlapping windows — the
    * standard smoothing shape for rates and rolling aggregates (and the
    * batch twin of Structured Streaming's `window(ts, len, slide)`).
    * Spark's `window()` enumerates member windows per row; the oracle
    * twin reproduces the same epoch-aligned bucketing with
    * `time_bucket` + an explicit 2-element unnest.
    */
  def slidingWindows(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type")).agg(
      count(lit(1)).as("n_events"),
      round(sum(col("value").cast("decimal(18,2)")).cast("double"), 2).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
      .orderBy("window_start", "event_type")

  /** Next-event transition matrix (first-order Markov over the event
    * stream): per user, order events by (ts, event_id) and count
    * (event_type → next event_type) transitions; probability = count /
    * out-degree of the source type, rounded for engine-exact compare.
    * One window pass on the user key (the data's natural partition) +
    * one small aggregation on the type pair — the session-path
    * analytics building block (what-happens-after-X).
    */
  def eventTransitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val pairs = events
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val counts = pairs.groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val outDeg = counts.groupBy("from_type").agg(sum(col("n_transitions")).as("n_from"))
    counts.join(outDeg, "from_type")
      .withColumn("p", round(col("n_transitions").cast("double") / col("n_from"), 6))
      .select("from_type", "to_type", "n_transitions", "p")
      .orderBy("from_type", "to_type")
  }

  /** Top session paths: the clickstream-analytics classic "what do
    * sessions look like" — gap-sessionize (same assignment as
    * [[sessionize]]), render each session as its ordered event-type
    * string, count path frequencies corpus-wide, top-N with a
    * deterministic tie-break. `collect_list` order is non-contractual →
    * sort the (ts, event_id, type) structs before joining. Two keyed
    * shuffles (user sessions, then path counts) + a top-N.
    */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30, topN: Int = 20): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapMicros = gapMinutes.toLong * 60L * 1000000L
    val prevTs = lag(col("ts"), 1).over(byUser)
    val newSession = when(prevTs.isNull ||
      unix_micros(col("ts")) - unix_micros(prevTs) > gapMicros, 1L).otherwise(0L)
    events
      .withColumn("session_id",
        sum(newSession).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id")).agg(
        array_join(transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
          s => s.getField("event_type")), ">").as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(topN)
  }

  /** As-of join: for each event, the most recent order of the same user
    * at-or-before the event time — implemented with the union-tag trick:
    * tag both sides, sort within user by (time, right-before-left), and
    * propagate the latest right-side payload with `last(ignoreNulls)`.
    * ONE shuffle + sort on the join key — no range/theta join, no
    * per-key driver loop; this is the shape that scales (a naive
    * inequality join is O(n·m) per key).
    *
    * Right side is deduped to one row per (key, time) (max order key) so
    * ties are deterministic in both engines; DuckDB's native ASOF JOIN is
    * the oracle twin.
    */
  def asofJoin(events: DataFrame, orders: DataFrame): DataFrame = {
    val r = orders.groupBy(col("o_custkey").as("key"), col("o_orderdate").as("t"))
      .agg(max(col("o_orderkey")).as("order_key"))
      .select(col("key"), col("t"), col("order_key"),
        lit(null).cast("long").as("event_id"), lit(0).as("is_left"))
    val l = events.select(col("user_id").as("key"), col("ts").as("t"),
      lit(null).cast("long").as("order_key"), col("event_id"), lit(1).as("is_left"))
    val w = Window.partitionBy(col("key"))
      .orderBy(col("t"), col("is_left"))
      .rowsBetween(Window.unboundedPreceding, 0)
    r.unionByName(l)
      .withColumn("last_order_key", last(col("order_key"), ignoreNulls = true).over(w))
      .filter(col("is_left") === 1)
      .select(col("event_id"), col("key").as("user_id"),
        date_format(col("t"), "yyyy-MM-dd HH:mm:ss.SSSSSS").as("event_ts"),
        col("last_order_key"))
      .orderBy("event_id")
  }

  /** Range join, bucketized: all same-user event pairs (a, b) with
    * `a.ts < b.ts <= a.ts + window`. A naive inequality join is O(n·m)
    * per key; bucketizing time into window-width buckets turns it into
    * an EQUI-join on (user, bucket) — the left side explodes to its two
    * overlapping buckets, the right side keeps one — followed by the
    * exact range filter. One shuffle, no nested-loop; each qualifying
    * pair matches exactly once (the right row's bucket is unique).
    * Integer `div` on microseconds keeps bucket math exact.
    */
  def rangeSelfJoin(events: DataFrame, windowMinutes: Int = 60): DataFrame = {
    val w = windowMinutes.toLong * 60L * 1000000L
    val a = events.select(col("user_id"), col("event_id").as("event_a"),
        unix_micros(col("ts")).as("ta"))
      .withColumn("bucket", explode(array(expr(s"ta div $w"), expr(s"ta div $w") + 1)))
    val b = events.select(col("user_id"), col("event_id").as("event_b"),
        unix_micros(col("ts")).as("tb"))
      .withColumn("bucket", expr(s"tb div $w"))
    a.join(b, Seq("user_id", "bucket"))
      .filter(col("tb") > col("ta") && col("tb") <= col("ta") + w)
      .select(col("event_a"), col("event_b"), col("user_id"),
        (col("tb") - col("ta")).as("gap_micros"))
      .orderBy("event_a", "event_b")
  }

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

  /** Hourly event counts per type — shared by the batch spike detector
    * and, as the offline-trained reference, by the streaming alert sink
    * ([[graft.streaming.StreamingOps.spikeAlerts]]).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(count(lit(1)).as("n_events"))

  /** Per-type mean/stddev of hourly counts (the "model" of the z-score
    * detector; at most types×hours input rows).
    */
  def hourlyStats(events: DataFrame): DataFrame =
    hourlyCounts(events).groupBy("event_type").agg(
      avg(col("n_events")).as("m"), stddev_samp(col("n_events")).as("sd"))

  /** Hourly volume anomaly detection (z-score spike/dip flagging): per
    * event type, hours whose event count deviates from the type's mean
    * hourly count by ≥ `zThreshold` sample standard deviations. Two
    * aggregations — hourly counts (shuffle on (type, hour)), then the
    * per-type mean/stddev reduced from at most types×hours rows — and a
    * broadcast-sized join back. The z-score is rounded BEFORE the
    * threshold filter so membership is engine-exact.
    */
  def hourlySpikes(events: DataFrame, zThreshold: Double = 2.0): DataFrame = {
    val hourly = hourlyCounts(events)
    val stats = hourlyStats(events)
    hourly.join(stats, "event_type")
      .withColumn("z", round((col("n_events") - col("m")) / col("sd"), 4))
      .filter(abs(col("z")) >= zThreshold)
      .select(col("event_type"),
        date_format(col("hr"), "yyyy-MM-dd HH:mm:ss").as("window_start"),
        col("n_events"), col("z"))
      .orderBy("event_type", "window_start")
  }

  /** Ordered conversion funnel: how many users reached each stage IN
    * ORDER — a user counts for stage i only with an event of that type
    * strictly after their stage-(i-1) entry time. Each stage is one
    * filtered aggregation joined to the previous stage's (user, time)
    * table; at scale every step shuffles on user_id only, and stage
    * tables shrink monotonically (classic funnel pruning), so later
    * stages are nearly free. Strictly-after semantics and min-entry
    * times make the result deterministic and engine-exact.
    */
  def funnel(events: DataFrame,
             stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    var reached = events.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min(col("ts")).as("t_reach"))
    val perStage = scala.collection.mutable.Buffer[(String, DataFrame)](stages.head -> reached)
    for (st <- stages.tail) {
      reached = events.filter(col("event_type") === st)
        .join(reached, "user_id")
        .filter(col("ts") > col("t_reach"))
        .groupBy("user_id").agg(min(col("ts")).as("t_reach"))
      perStage += (st -> reached)
    }
    perStage.zipWithIndex.map { case ((st, df), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }.reduce(_ unionByName _).orderBy("stage_idx")
  }

  /** Cohort retention: users are cohorted by first-seen day; for each
    * (cohort day, day offset) the count of cohort members active that
    * day and the retention rate against the cohort size. Two
    * aggregations on user_id + one on (cohort, offset) — the distinct
    * user-day reduction happens before the cohort join, so the join
    * input is at most users × active-days, not raw events.
    */
  def cohortRetention(events: DataFrame, maxOffsetDays: Int = 7): DataFrame = {
    val firstSeen = events.groupBy("user_id").agg(min(to_date(col("ts"))).as("cohort_day"))
    val cohortSizes = firstSeen.groupBy("cohort_day").agg(count(lit(1)).as("cohort_size"))
    events.select(col("user_id"), to_date(col("ts")).as("event_day")).distinct()
      .join(firstSeen, "user_id")
      .withColumn("offset_days", datediff(col("event_day"), col("cohort_day")))
      .filter(col("offset_days") <= maxOffsetDays)
      .groupBy("cohort_day", "offset_days").agg(count(lit(1)).as("n_active"))
      .join(cohortSizes, "cohort_day")
      .select(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort_day"),
        col("offset_days"), col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") / col("cohort_size"), 6).as("retention"))
      .orderBy("cohort_day", "offset_days")
  }
}
