package graft.streaming

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

class StreamingOpsSpec extends AnyFunSuite with SparkSpec {
  import StreamingOps._

  def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts: incremental hourly counts over a memory stream") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = windowedCounts(input.toDF()).writeStream
      .outputMode("update").format("memory").queryName("wc_out").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:20:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 01:05:00"), 1, "view", 3.0))
      q.processAllAvailable()
      val rows = spark.sql("SELECT * FROM wc_out ORDER BY window_start, event_type").collect()
      assert(rows.map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSeq ===
        Seq(("2024-01-01 00:00:00.0", "click", 2L), ("2024-01-01 01:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("sessionize: sessions close on gap timeout as the watermark advances") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(spark, input.toDF()).writeStream
      .outputMode("append").format("memory").queryName("sess_out").start()
    try {
      // session 1: two events 5 min apart
      input.addData(
        Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0),
        Event(2, ts("2024-01-01 00:05:00"), 7, "click", 2.0))
      q.processAllAvailable()
      // >30min later: new session; watermark moves past old session's gap
      input.addData(Event(3, ts("2024-01-01 01:00:00"), 7, "click", 4.0))
      q.processAllAvailable()
      // push watermark far ahead so the second session times out too
      input.addData(Event(4, ts("2024-01-01 03:00:00"), 8, "view", 8.0))
      q.processAllAvailable()
      input.addData(Event(5, ts("2024-01-01 09:00:00"), 9, "view", 0.0))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT user_id, session_start, n_events, sum_value FROM sess_out ORDER BY session_start")
        .collect()
      assert(rows.length >= 2)
      val first = rows(0)
      assert(first.getLong(0) === 7L)
      assert(first.getTimestamp(1).toString === "2024-01-01 00:00:00.0")
      assert(first.getLong(2) === 2L)
      assert(first.getDouble(3) === 3.0)
      val second = rows(1)
      assert(second.getLong(0) === 7L)
      assert(second.getTimestamp(1).toString === "2024-01-01 01:00:00.0")
      assert(second.getLong(2) === 1L)
    } finally q.stop()
  }

  test("streaming windowedCounts agrees with the batch tumbling operator on testdata") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val batchDf = graft.Tables.events(spark, "/root/testdata/sf0.001")
    val batch = graft.ext.Events.tumblingWindows(batchDf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val input = MemoryStream[Event]
    val q = windowedCounts(input.toDF()).writeStream
      .outputMode("update").format("memory").queryName("wc_par").start()
    try {
      val evs = batchDf.selectExpr("event_id", "ts", "user_id", "event_type", "value")
        .as[Event].collect()
      input.addData(evs.toSeq)
      q.processAllAvailable()
      val stream = spark.sql(
        """SELECT date_format(window_start, 'yyyy-MM-dd HH:mm:ss'), event_type, n_events
          |FROM wc_par""".stripMargin).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(stream === batch)
    } finally q.stop()
  }
}
