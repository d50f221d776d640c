package graft.ext

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Boundary semantics of the as-of and range joins (handcrafted rows —
  * the oracle checks cover bulk agreement; these pin the edges).
  */
class EventsJoinSpec extends AnyFunSuite with SparkSpec {

  def ev(rows: (Long, String, Long)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t, uid) => (id, Timestamp.valueOf(t), uid, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  def ord(rows: (Long, Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (ok, ck, d) => (ok, ck, "F", 1.0, Timestamp.valueOf(d), "1-URGENT") }
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate",
        "o_orderpriority")
  }

  test("asofJoin: equal timestamps match (>= semantics); later orders don't") {
    val events = ev((1L, "2024-01-01 10:00:00", 7L), (2L, "2024-01-01 09:00:00", 7L))
    val orders = ord(
      (100L, 7L, "2024-01-01 10:00:00"), // exactly at event 1's ts → matches event 1
      (101L, 7L, "2024-01-01 12:00:00")) // after both → matches neither
    val rows = Events.asofJoin(events, orders).collect()
      .map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Long])).toMap
    assert(rows(1L) === Some(100L))
    assert(rows(2L) === None) // nothing at-or-before 09:00
  }

  test("asofJoin: most recent wins; ties on (key, time) resolve to max order key") {
    val events = ev((1L, "2024-01-01 23:00:00", 7L))
    val orders = ord(
      (100L, 7L, "2024-01-01 08:00:00"),
      (200L, 7L, "2024-01-01 20:00:00"), // most recent before the event
      (150L, 7L, "2024-01-01 20:00:00")) // same instant → dedup keeps max(200)
    val rows = Events.asofJoin(events, orders).collect()
    assert(rows(0).getLong(3) === 200L)
  }

  test("rangeSelfJoin: window edges — strictly-after start, inclusive end") {
    val events = ev(
      (1L, "2024-01-01 00:00:00", 7L),
      (2L, "2024-01-01 01:00:00", 7L),          // exactly +1h → included (<=)
      (3L, "2024-01-01 01:00:00.000001", 7L),   // 1h + 1µs after e1 → excluded for e1
      (4L, "2024-01-01 00:00:00", 8L))          // other user → never pairs
    val pairs = Events.rangeSelfJoin(events, windowMinutes = 60).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L), (2L, 3L)))
  }

  test("rangeSelfJoin: no duplicate pairs across bucket boundaries") {
    // events 30min apart straddle a bucket edge; the two-bucket explode
    // must not double-count the pair
    val events = ev((1L, "2024-01-01 00:45:00", 7L), (2L, "2024-01-01 01:15:00", 7L))
    val pairs = Events.rangeSelfJoin(events, windowMinutes = 60).collect()
    assert(pairs.length === 1)
    assert(pairs(0).getLong(3) === 30L * 60L * 1000000L) // exact 30min gap in µs
  }
}
