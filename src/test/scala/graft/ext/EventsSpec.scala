package graft.ext

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class EventsSpec extends AnyFunSuite with SparkSpec {

  def ev(rows: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, ts, uid) =>
      (id, Timestamp.valueOf(ts), uid, "click", 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  def evTyped(rows: (Long, String, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, ts, uid, tpe) =>
      (id, Timestamp.valueOf(ts), uid, tpe, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  test("hourlySpikes flags only hours beyond the z threshold") {
    // type 'a': 9 calm hours of 10 events + one 100-event spike hour
    val calm = (0 until 9).flatMap(h => (0 until 10).map(i =>
      (h * 100L + i, f"2024-01-01 $h%02d:00:${i}%02d", 1L, "a")))
    val spike = (0 until 100).map(i =>
      (5000L + i, f"2024-01-02 03:00:${i % 60}%02d.${i}%03d", 1L, "a"))
    val d = evTyped(calm ++ spike: _*)
    val rows = Events.hourlySpikes(d, zThreshold = 2.0).collect()
    assert(rows.length === 1)
    assert(rows(0).getString(1) === "2024-01-02 03:00:00")
    assert(rows(0).getLong(2) === 100L)
    assert(rows(0).getDouble(3) > 2.0)
  }

  test("funnel: stages must happen in order; out-of-order users don't convert") {
    val d = evTyped(
      // user 1: full ordered funnel
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 00:01:00", 1L, "click"),
      (3L, "2024-01-01 00:02:00", 1L, "purchase"),
      // user 2: clicked BEFORE viewing — stalls at view
      (4L, "2024-01-01 00:01:00", 2L, "click"),
      (5L, "2024-01-01 00:02:00", 2L, "view"),
      // user 3: view then click, no purchase
      (6L, "2024-01-01 00:00:00", 3L, "view"),
      (7L, "2024-01-01 00:03:00", 3L, "click"),
      // user 4: purchase only — never enters
      (8L, "2024-01-01 00:00:00", 4L, "purchase"))
    val rows = Events.funnel(d).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rows === Map("view" -> 3L, "click" -> 2L, "purchase" -> 1L))
  }

  test("funnel: same-timestamp stage events do NOT convert (strictly-after)") {
    val d = evTyped(
      (1L, "2024-01-01 00:00:00", 1L, "view"),
      (2L, "2024-01-01 00:00:00", 1L, "click"))
    val rows = Events.funnel(d).collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(rows("view") === 1L)
    assert(rows("click") === 0L)
  }

  test("cohortRetention: offsets count distinct active days against cohort size") {
    val d = evTyped(
      // cohort 01-01: users 1,2. user 1 returns day+1 (twice → one active day)
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-02 09:00:00", 1L, "view"),
      (3L, "2024-01-02 11:00:00", 1L, "click"),
      (4L, "2024-01-01 12:00:00", 2L, "view"),
      // cohort 01-03: user 3 only
      (5L, "2024-01-03 08:00:00", 3L, "view"))
    val rows = Events.cohortRetention(d).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rows(("2024-01-01", 0)) === ((2L, 2L, 1.0)))
    assert(rows(("2024-01-01", 1)) === ((1L, 2L, 0.5)))
    assert(rows(("2024-01-03", 0)) === ((1L, 1L, 1.0)))
    assert(rows.size === 3)
  }

  test("sessionize: gap of exactly 30min stays in-session; over 30min splits (strict >)") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 7L),
      (2L, "2024-01-01 00:30:00", 7L),          // exactly 30:00 gap → same session
      (3L, "2024-01-01 01:00:00.000001", 7L),   // 30:00.000001 gap → new session
      (4L, "2024-01-01 01:10:00", 7L))
    val rows = Events.sessionize(d).collect()
    assert(rows.map(r => (r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 2L), (2L, 2L))) // two sessions of two events each
    assert(rows(0).getAs[String]("session_start") === "2024-01-01 00:00:00.000000")
    assert(rows(1).getAs[String]("session_start") === "2024-01-01 01:00:00.000001")
  }

  test("sessionize: sessions are per-user (no cross-user bleed)") {
    val d = ev(
      (1L, "2024-01-01 00:00:00", 1L), (2L, "2024-01-01 00:05:00", 2L),
      (3L, "2024-01-01 00:10:00", 1L))
    val rows = Events.sessionize(d).collect()
    assert(rows.length === 2)
    assert(rows.map(r => (r.getLong(0), r.getLong(2))).toSet === Set((1L, 2L), (2L, 1L)))
  }

  test("tumblingWindows: events land in their hour bucket, sums are exact") {
    val d = ev(
      (1L, "2024-01-01 00:59:59", 1L), (2L, "2024-01-01 01:00:00", 1L),
      (3L, "2024-01-01 01:59:59.999999", 1L))
    val rows = Events.tumblingWindows(d).collect()
    assert(rows.map(r => (r.getString(0), r.getLong(2))).toSeq ===
      Seq(("2024-01-01 00:00:00", 1L), ("2024-01-01 01:00:00", 2L)))
  }

  test("slidingWindows: every event lands in exactly length/slide = 2 windows") {
    val d = ev((1L, "2024-01-01 10:47:11", 1L), (2L, "2024-01-01 10:10:00", 1L))
    val rows = Events.slidingWindows(d).collect()
    // event 1 → windows 10:00 and 10:30; event 2 → 09:30 and 10:00
    val byWindow = rows.map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(byWindow === Map(
      "2024-01-01 09:30:00" -> 1L,
      "2024-01-01 10:00:00" -> 2L,
      "2024-01-01 10:30:00" -> 1L))
    assert(rows.map(_.getLong(2)).sum === 4L, "2 events × 2 windows each")
  }

  test("eventTransitions: per-user ordered pairs, probabilities sum to 1 per source") {
    val d = evTyped(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:01:00", 1L, "cart"),
      (3L, "2024-01-01 10:02:00", 1L, "view"),
      (4L, "2024-01-01 10:03:00", 1L, "buy"),
      (5L, "2024-01-01 10:00:30", 2L, "view"),   // other user: view→cart only
      (6L, "2024-01-01 10:01:30", 2L, "cart"))
    val rows = Events.eventTransitions(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // user-1 path: view→cart→view→buy; user-2: view→cart
    assert(rows(("view", "cart")) === ((2L, 0.666667)))
    assert(rows(("view", "buy")) === ((1L, 0.333333)))
    // u2's trailing cart has no successor → cart's only exit is cart→view
    assert(rows(("cart", "view")) === ((1L, 1.0)))
    // cross-user boundary produces NO transition (cart of u1 ↛ view of u2)
    assert(!rows.contains(("buy", "view")))
  }

  test("sessionPaths: gap splits sessions, paths render in event order") {
    val d = evTyped(
      (1L, "2024-01-01 10:00:00", 1L, "view"),
      (2L, "2024-01-01 10:05:00", 1L, "cart"),
      (3L, "2024-01-01 12:00:00", 1L, "view"),   // > 30 min gap → new session
      (4L, "2024-01-01 10:00:00", 2L, "view"),
      (5L, "2024-01-01 10:02:00", 2L, "cart"))
    val rows = Events.sessionPaths(d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows === Map("view>cart" -> 2L, "view" -> 1L))
  }

  test("dailyFeatures: RANGE frame shrinks across calendar gaps; lags are row-based") {
    // type 'a': days 0,1,2 then a gap to day 10
    val d = evTyped(
      (1L, "2024-01-01 01:00:00", 1L, "a"), (2L, "2024-01-01 02:00:00", 2L, "a"),
      (3L, "2024-01-02 01:00:00", 1L, "a"),
      (4L, "2024-01-03 01:00:00", 1L, "a"),
      (5L, "2024-01-11 01:00:00", 1L, "a"))
    val rows = Events.dailyFeatures(d).collect()
      .map(r => r.getString(1) -> ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows("2024-01-01") === ((2L, 2L, 1L)))
    assert(rows("2024-01-03") === ((1L, 4L, 3L))) // days 1-3 all inside 7-day range
    // day 11: the RANGE frame (days 5..11) contains only itself — a ROWS
    // frame would wrongly include the pre-gap days
    assert(rows("2024-01-11") === ((1L, 1L, 1L)))
    val d11 = Events.dailyFeatures(d).collect().find(_.getString(1) == "2024-01-11").get
    assert(d11.getLong(5) === 1L, "lag_1 is row-based: previous observed day")
    assert(d11.getLong(7) === 0L, "delta vs previous observed day")
  }

  test("testdata events parse as microsecond timestamps (nanos conversion exact)") {
    val d = graft.Tables.events(spark, "/root/testdata/sf0.001")
    assert(d.schema("ts").dataType === org.apache.spark.sql.types.TimestampType)
    val first = d.orderBy("event_id").limit(1).collect()(0).getAs[Timestamp]("ts")
    assert(first.toString === "2024-01-01 00:09:58.778549")
  }
}
