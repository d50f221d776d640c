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

  test("sliding windowedCounts over a stream ≡ batch slidingWindows") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val events = Seq(
      Event(1, ts("2024-01-01 10:47:11"), 1, "click", 1.5),
      Event(2, ts("2024-01-01 10:10:00"), 2, "click", 2.5),
      Event(3, ts("2024-01-01 11:05:00"), 1, "view", 3.0))
    val input = MemoryStream[Event]
    val q = windowedCounts(input.toDF(), slide = "30 minutes").writeStream
      .outputMode("update").format("memory").queryName("swc_out").start()
    try {
      input.addData(events: _*)
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM swc_out").collect()
        .map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      val batch = graft.ext.Events.slidingWindows(
        events.toDF().withColumn("props", org.apache.spark.sql.functions.lit("{}")))
        .collect()
        .map(r => (r.getString(0) + ".0", r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
      assert(streamed.size === 5, "3 events × 2 windows, minus one shared (win,type)")
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

  test("sessionize: a very late event is dropped by the watermark and the query survives") {
    // Pins the observed Spark 4.1 contract: rows older than the watermark
    // are filtered BEFORE flatMapGroupsWithState (visible as
    // numRowsDroppedByWatermark), so they can neither corrupt session
    // state nor produce a session. The timeout clamp in sessionize
    // (max(end+gap, wm+1)) is defense-in-depth for engines/versions that
    // deliver late rows through — setTimeoutTimestamp throws on a
    // timestamp at/behind the watermark and would kill the query.
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = sessionize(spark, input.toDF()).writeStream
      .outputMode("append").format("memory").queryName("sess_late_out").start()
    try {
      // advance the watermark far ahead (10-min delay => wm ~ 09:50)
      input.addData(Event(1, ts("2024-01-01 10:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      // VERY late event for a fresh key: hours behind the watermark
      input.addData(Event(2, ts("2024-01-01 00:00:00"), 99, "click", 5.0))
      q.processAllAvailable()
      assert(q.isActive, "query must survive the late event")
      val dropped = q.recentProgress.flatMap(_.stateOperators)
        .map(_.numRowsDroppedByWatermark).sum
      assert(dropped === 1L, "the late row must be dropped by the watermark")
      assert(spark.sql("SELECT * FROM sess_late_out WHERE user_id = 99").collect().isEmpty,
        "a dropped row must not produce a session")
    } finally q.stop()
  }

  test("windowedDistinctUsers: HLL sketch aggregates incrementally and equals the batch twin") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = windowedDistinctUsers(input.toDF()).writeStream
      .outputMode("update").format("memory").queryName("hll_out").start()
    try {
      // users 1,2 in batch one; user 2 again (dup) + user 3 in batch two —
      // the sketch state must merge across batches, not restart
      input.addData(
        Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:20:00"), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(
        Event(3, ts("2024-01-01 00:30:00"), 2, "click", 1.0),
        Event(4, ts("2024-01-01 00:40:00"), 3, "click", 1.0))
      q.processAllAvailable()
      val streaming = spark.sql(
        "SELECT window_start, event_type, approx_users FROM hll_out ORDER BY window_start")
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(streaming.last === ("2024-01-01 00:00:00.0", "click", 3L))
      // batch twin over the same rows produces the identical estimate
      val batchDf = Seq(
        (1L, ts("2024-01-01 00:10:00"), 1L), (2L, ts("2024-01-01 00:20:00"), 2L),
        (3L, ts("2024-01-01 00:30:00"), 2L), (4L, ts("2024-01-01 00:40:00"), 3L))
        .toDF("event_id", "ts", "user_id")
        .withColumn("event_type", org.apache.spark.sql.functions.lit("click"))
        .withColumn("value", org.apache.spark.sql.functions.lit(1.0))
      val batch = windowedDistinctUsers(batchDf)
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2))).toSet
      assert(batch === Set(("2024-01-01 00:00:00.0", "click", 3L)))
    } finally q.stop()
  }

  test("windowedTopItems: MG counters accumulate across batches and equal the batch twin") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    // complete mode: the memory table is REPLACED each trigger, so it
    // holds only the latest counter state (update mode would retain
    // batch one's intermediate (click, 2) row alongside the final rows)
    val q = windowedTopItems(input.toDF()).writeStream
      .outputMode("complete").format("memory").queryName("mg_out").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:20:00"), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(
        Event(3, ts("2024-01-01 00:30:00"), 2, "view", 1.0),
        Event(4, ts("2024-01-01 00:40:00"), 3, "click", 1.0))
      q.processAllAvailable()
      // counters must carry batch one's clicks into batch two's state
      val streaming = spark.sql(
        """SELECT window_start, e.item, e.count
          |FROM (SELECT window_start, explode(top_items) AS e FROM mg_out)
          |ORDER BY e.count DESC, e.item""".stripMargin)
        .collect().map(r => (r.getTimestamp(0).toString, r.getString(1), r.getLong(2)))
      assert(streaming.toSeq === Seq(
        ("2024-01-01 00:00:00.0", "click", 3L),
        ("2024-01-01 00:00:00.0", "view", 1L)))
    } finally q.stop()
  }

  test("windowedValueQuantiles: sketch state accumulates across batches ≡ batch twin, even past capacity") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    // k=4 with 6 distinct cent values across the two batches: the state
    // goes LOSSY mid-stream — the bit-identical-merge contract (not an
    // exactness regime) is what keeps streaming ≡ batch here
    val q = windowedValueQuantiles(input.toDF(), k = 4).writeStream
      .outputMode("complete").format("memory").queryName("qsk_out").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:15:00"), 2, "click", 2.0),
        Event(3, ts("2024-01-01 00:20:00"), 3, "click", 3.0))
      q.processAllAvailable()
      input.addData(
        Event(4, ts("2024-01-01 00:30:00"), 2, "click", 4.0),
        Event(5, ts("2024-01-01 00:40:00"), 3, "click", 5.0),
        Event(6, ts("2024-01-01 00:45:00"), 3, "click", 6.0))
      q.processAllAvailable()
      val streaming = spark.sql(
        "SELECT window_start, p50_cents, p99_cents FROM qsk_out ORDER BY window_start")
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      val batchDf = (1 to 6).map(i =>
          (i.toLong, ts(f"2024-01-01 00:${(i * 7) % 50 + 10}%02d:00"), i.toLong))
        .toDF("event_id", "ts", "user_id")
        .withColumn("event_type", org.apache.spark.sql.functions.lit("click"))
        .withColumn("value",
          org.apache.spark.sql.functions.col("event_id").cast("double"))
      val batch = windowedValueQuantiles(batchDf, k = 4)
        .collect().map(r => (r.getTimestamp(0).toString, r.getLong(1), r.getLong(2)))
      assert(streaming.toSeq === batch.toSeq)
      assert(streaming.length === 1)
    } finally q.stop()
  }

  test("imageDedupStream: exact repeats collapse; stored near-dups flagged; batch parity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sc = spark.sqlContext
    import graft.ext.Multimodal
    // cluster-pattern PNGs (same fixture arithmetic as
    // syntheticPngClusters): same key => Hamming <= 1 via the corner
    // bump, distinct keys tens of bits apart
    def png(key: Long, bump: Int): Array[Byte] = {
      val w = (8 + key % 9).toInt; val h = (8 + key % 7).toInt
      Multimodal.PngCodec.encode(w, h, (x, y) => {
        val r0 = ((key * 7 + x * 37 + y * 59 + x * y * 13) % 256).toInt
        val r = if (x == 0 && y == 0) (r0 + bump) % 256 else r0
        val g = ((key * 11 + x * 23 + y * 41 + x * y * 7) % 256).toInt
        val b = ((key * 13 + x * 29 + y * 31 + x * y * 17) % 256).toInt
        (r << 16) | (g << 8) | b
      })
    }
    // stored corpus: one image per key 1..3 (hashes only reach the stream)
    val storedMedia = Seq((101L, png(1, 0)), (102L, png(2, 0)), (103L, png(3, 0)))
      .toDF("doc_id", "payload")
    val stored = Multimodal.imageDhash(spark, storedMedia)

    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val images = input.toDF().toDF("doc_id", "payload", "ts")
    val q = imageDedupStream(spark, images, stored).writeStream
      .outputMode("append").format("memory").queryName("imgdedup_out").start()
    try {
      input.addData(
        (1L, png(1, 5), ts("2024-01-01 00:00:00")),  // near-dup of stored 101
        (2L, png(9, 0), ts("2024-01-01 00:00:10")),  // genuinely new key
        (3L, png(9, 0), ts("2024-01-01 00:00:20")))  // exact repeat of doc 2 (same hash)
      q.processAllAvailable()
      input.addData(
        (4L, png(2, 7), ts("2024-01-01 00:01:00")),  // near-dup of stored 102
        (5L, png(9, 0), ts("2024-01-01 00:01:10")))  // cross-batch exact repeat
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT doc_id, stored_dup_of, hamming FROM imgdedup_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      // docs 1 and 4 match their stored neighbors within 1 bit; docs
      // 2/3/5 share a hash with no stored image (3 and 5 are dropped by
      // the exact-dedup state before the join ever sees them)
      assert(rows.map(t => (t._1, t._2)).toSeq === Seq((1L, 101L), (4L, 102L)))
      assert(rows.forall(_._3 <= 1), "corner bump moves at most one dHash sample")
      // batch parity: the incremental batch path finds the same cross
      // pairs for the same (stored, new) corpus
      val newMedia = Seq((1L, png(1, 5)), (2L, png(9, 0)), (4L, png(2, 7)))
        .toDF("doc_id", "payload")
      val batch = Multimodal.imageNearDupIncremental(spark, newMedia, stored)
        .filter(col("is_cross"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === Set((1L, 101L), (4L, 102L)),
        "stream flags exactly the batch path's cross pairs")
    } finally q.stop()
  }

  test("audioDedupStream: exact repeats collapse; stored near-dups flagged; batch parity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sc = spark.sqlContext
    import graft.ext.Multimodal
    // cluster-pattern WAVs (same fixture arithmetic as
    // syntheticWavClusters): same key => Hamming <= 1 via the
    // first-sample bump, distinct keys far apart
    def wav(key: Long, bump: Int): Array[Byte] = {
      val n = (200 + key % 100).toInt
      val rate = (8000 + (key % 4) * 4000).toInt
      val samples = Array.tabulate(n) { i =>
        val base = ((key * 31 + i.toLong * 17) % 2003) - 1001
        (if (i == 0) base + bump else base).toShort
      }
      Multimodal.WavCodec.encode(rate.toFloat, samples)
    }
    // stored corpus: one clip per key 1..3 (hashes only reach the stream)
    val storedMedia = Seq((101L, wav(1, 0)), (102L, wav(2, 0)), (103L, wav(3, 0)))
      .toDF("doc_id", "payload")
    val stored = Multimodal.audioEhash(spark, storedMedia)

    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val clips = input.toDF().toDF("doc_id", "payload", "ts")
    val q = audioDedupStream(spark, clips, stored).writeStream
      .outputMode("append").format("memory").queryName("auddedup_out").start()
    try {
      input.addData(
        (1L, wav(1, 5), ts("2024-01-01 00:00:00")),  // near-dup of stored 101
        (2L, wav(9, 0), ts("2024-01-01 00:00:10")),  // genuinely new key
        (3L, wav(9, 0), ts("2024-01-01 00:00:20")))  // exact repeat of doc 2
      q.processAllAvailable()
      input.addData(
        (4L, wav(2, 7), ts("2024-01-01 00:01:00")),  // near-dup of stored 102
        (5L, wav(9, 0), ts("2024-01-01 00:01:10")))  // cross-batch exact repeat
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT doc_id, stored_dup_of, hamming FROM auddedup_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      assert(rows.map(t => (t._1, t._2)).toSeq === Seq((1L, 101L), (4L, 102L)))
      assert(rows.forall(_._3 <= 1), "first-sample bump flips at most one eHash bit")
      // batch parity: the incremental batch path finds the same cross
      // pairs for the same (stored, new) corpus
      val newMedia = Seq((1L, wav(1, 5)), (2L, wav(9, 0)), (4L, wav(2, 7)))
        .toDF("doc_id", "payload")
      val batch = Multimodal.audioNearDupIncremental(spark, newMedia, stored)
        .filter(col("is_cross"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === Set((1L, 101L), (4L, 102L)),
        "stream flags exactly the batch path's cross pairs")
    } finally q.stop()
  }

  test("videoDedupStream: exact repeats collapse; stored near-dups flagged; batch parity") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    implicit val sc = spark.sqlContext
    import graft.ext.Multimodal
    // cluster-pattern GVID videos (same fixture arithmetic as
    // syntheticVideoClusters): same key => total Hamming <= 1 via the
    // frame-0 corner bump, distinct keys tens of bits apart per slot
    def video(key: Long, bump: Int): Array[Byte] = {
      val n = (4 + key % 5).toInt
      val w = (8 + key % 9).toInt; val h = (8 + key % 7).toInt
      val frames = (0 until n).map { f =>
        Multimodal.PngCodec.encode(w, h, (x, y) => {
          val r0 = ((key * 7 + f * 19 + x * 37 + y * 59 + x * y * 13) % 256).toInt
          val r = if (f == 0 && x == 0 && y == 0) (r0 + bump) % 256 else r0
          val g = ((key * 11 + f * 23 + x * 23 + y * 41 + x * y * 7) % 256).toInt
          val b = ((key * 13 + f * 29 + x * 29 + y * 31 + x * y * 17) % 256).toInt
          (r << 16) | (g << 8) | b
        })
      }
      Multimodal.VideoCodec.encode(12, frames)
    }
    // stored corpus: one video per key 1..3 (slot hashes only)
    val storedMedia = Seq((101L, video(1, 0)), (102L, video(2, 0)), (103L, video(3, 0)))
      .toDF("doc_id", "payload")
    val stored = Multimodal.videoPhash(spark, storedMedia)
      .select("doc_id", "slot", "dhash")

    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val videos = input.toDF().toDF("doc_id", "payload", "ts")
    val q = videoDedupStream(spark, videos, stored).writeStream
      .outputMode("append").format("memory").queryName("viddedup_out").start()
    try {
      input.addData(
        (1L, video(1, 5), ts("2024-01-01 00:00:00")),  // near-dup of stored 101
        (2L, video(9, 0), ts("2024-01-01 00:00:10")),  // genuinely new key
        (3L, video(9, 0), ts("2024-01-01 00:00:20")))  // exact repeat of doc 2
      q.processAllAvailable()
      input.addData(
        (4L, video(2, 7), ts("2024-01-01 00:01:00")),  // near-dup of stored 102
        (5L, video(9, 0), ts("2024-01-01 00:01:10")))  // cross-batch exact repeat
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT doc_id, stored_dup_of, total_hamming FROM viddedup_out")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      assert(rows.map(t => (t._1, t._2)).toSeq === Seq((1L, 101L), (4L, 102L)))
      assert(rows.forall(_._3 <= 1), "corner bump moves at most one slot bit")
      // batch parity: the incremental batch path finds the same cross pairs
      val newMedia = Seq((1L, video(1, 5)), (2L, video(9, 0)), (4L, video(2, 7)))
        .toDF("doc_id", "payload")
      val batch = Multimodal.videoNearDupIncremental(spark, newMedia, stored)
        .filter(col("is_cross"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === Set((1L, 101L), (4L, 102L)),
        "stream flags exactly the batch path's cross pairs")
    } finally q.stop()
  }

  test("imageDedupStream: degenerate stored corpus joins O(distinct hashes), not O(corpus)") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.ext.Multimodal
    // 50 stored flat images, ALL sharing the zero dHash (constant luma)
    // — the degenerate mass that would make every flat arrival join 50
    // rows if the stored side were banded per document
    val flatPng = Multimodal.PngCodec.encode(16, 16, (_, _) => 0x808080)
    val storedMedia = (1 to 50).map(i => (100L + i, flatPng)).toDF("doc_id", "payload")
    val stored = Multimodal.imageDhash(spark, storedMedia)
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val images = input.toDF().toDF("doc_id", "payload", "ts")
    val q = imageDedupStream(spark, images, stored).writeStream
      .outputMode("append").format("memory").queryName("imgdedup_degen").start()
    try {
      input.addData((1L, flatPng, ts("2024-01-01 00:00:00")))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT doc_id, stored_dup_of, hamming FROM imgdedup_degen")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      // ONE row per distinct stored fingerprint (here: one), with the
      // deterministic min-id exemplar — not one row per stored copy
      assert(rows.toSeq === Seq((1L, 101L, 0)),
        "degenerate bucket must collapse to the min-id exemplar row")
    } finally q.stop()
  }

  test("videoDedupStream: zero-frame arrivals emit nothing; duplicate stored sigs collapse") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.ext.Multimodal
    def flatVideo(): Array[Byte] = {
      val frame = Multimodal.PngCodec.encode(8, 8, (_, _) => 0x404040)
      Multimodal.VideoCodec.encode(12, Seq(frame, frame, frame, frame))
    }
    // 20 stored copies of the SAME flat video (identical signatures)
    val storedMedia = (1 to 20).map(i => (200L + i, flatVideo())).toDF("doc_id", "payload")
    val stored = Multimodal.videoPhash(spark, storedMedia)
      .select("doc_id", "slot", "dhash")
    val input = MemoryStream[(Long, Array[Byte], Timestamp)]
    val videos = input.toDF().toDF("doc_id", "payload", "ts")
    val q = videoDedupStream(spark, videos, stored).writeStream
      .outputMode("append").format("memory").queryName("viddedup_degen").start()
    try {
      input.addData(
        // zero-frame container: batch videoPhash emits no slots for it,
        // so the stream must emit nothing (not an all-zero signature
        // that would match every stored flat video)
        (1L, Multimodal.VideoCodec.encode(12, Seq.empty), ts("2024-01-01 00:00:00")),
        // flat arrival: matches the stored signature ONCE, min exemplar
        (2L, flatVideo(), ts("2024-01-01 00:00:10")))
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT doc_id, stored_dup_of, total_hamming FROM viddedup_degen")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      assert(rows.toSeq === Seq((2L, 201L, 0)),
        "one exemplar row for the flat arrival; nothing for the zero-frame one")
    } finally q.stop()
  }

  test("streaming junk-media gates: stateless verdicts equal the batch gates") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    import graft.ext.Multimodal
    val flatPng = Multimodal.PngCodec.encode(8, 8, (_, _) => 0x202020)
    val richPng = Multimodal.PngCodec.encode(8, 8, (x, y) => (x * 37 + y * 59) % 256)
    val silentWav = Multimodal.WavCodec.encode(8000f, new Array[Short](128))
    val loudWav = Multimodal.WavCodec.encode(8000f,
      Array.tabulate(128)(i => ((i * 997) % 2003 - 1001).toShort))
    val staticVid = Multimodal.VideoCodec.encode(12, Vector.fill(4)(flatPng))
    val sceneVid = Multimodal.VideoCodec.encode(12,
      Vector(richPng, flatPng, richPng, flatPng))
    val t0 = ts("2024-01-01 00:00:00")

    val imgIn = MemoryStream[(Long, Array[Byte], Timestamp)]
    val qi = imageQualityGateStream(spark,
      imgIn.toDF().toDF("doc_id", "payload", "ts")).writeStream
      .outputMode("append").format("memory").queryName("gate_img").start()
    val audIn = MemoryStream[(Long, Array[Byte], Timestamp)]
    val qa = audioQualityGateStream(spark,
      audIn.toDF().toDF("doc_id", "payload", "ts")).writeStream
      .outputMode("append").format("memory").queryName("gate_aud").start()
    val vidIn = MemoryStream[(Long, Array[Byte], Timestamp)]
    val qv = videoQualityGateStream(spark,
      vidIn.toDF().toDF("doc_id", "payload", "ts")).writeStream
      .outputMode("append").format("memory").queryName("gate_vid").start()
    try {
      imgIn.addData((1L, flatPng, t0), (2L, richPng, t0))
      audIn.addData((1L, silentWav, t0), (2L, loudWav, t0))
      vidIn.addData((1L, staticVid, t0), (2L, sceneVid, t0))
      qi.processAllAvailable(); qa.processAllAvailable(); qv.processAllAvailable()
      val img = spark.sql("SELECT doc_id, is_flat FROM gate_img")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(img === Map(1L -> true, 2L -> false))
      val aud = spark.sql("SELECT doc_id, is_quiet FROM gate_aud")
        .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(aud === Map(1L -> true, 2L -> false))
      val vid = spark.sql("SELECT doc_id, is_static, is_flat FROM gate_vid")
        .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getBoolean(2))).toMap
      assert(vid === Map(1L -> (true, true), 2L -> (false, false)))
      // stateless contract: verdicts equal the batch gates on the same
      // payloads (the gate arithmetic is payload-pure)
      val media = Seq((1L, flatPng), (2L, richPng)).toDF("doc_id", "payload")
      val batchImg = Multimodal.imageQualityStats(spark, media)
        .collect().map(r => r.getLong(0) -> r.getBoolean(9)).toMap
      assert(img === batchImg)
    } finally { qi.stop(); qa.stop(); qv.stop() }
  }

  test("dedupStream: duplicate event ids across batches emit once") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Event]
    val q = dedupStream(input.toDF()).writeStream
      .outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0),
        Event(1, ts("2024-01-01 00:00:00"), 1, "click", 1.0), // same-batch dup
        Event(2, ts("2024-01-01 00:01:00"), 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(Event(1, ts("2024-01-01 00:02:00"), 1, "click", 1.0)) // cross-batch dup
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup_out").collect().map(_.getLong(0))
      assert(ids.sorted.toSeq === Seq(1L, 2L))
    } finally q.stop()
  }

  test("urlDedupStream: canonical variants collapse to first fetch; batch parity") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val fetches = input.toDF().toDF("doc_id", "ts", "url")
    val q = urlDedupStream(fetches).writeStream
      .outputMode("append").format("memory").queryName("urldedup_out").start()
    try {
      // four surface forms of ONE page + one genuinely distinct page
      input.addData(
        (1L, ts("2024-01-01 00:00:00"), "HTTPS://News.Example.COM:443/p/7?b=2&utm_source=feed&a=1"),
        (2L, ts("2024-01-01 00:00:10"), "https://news.example.com/p/7/?a=1&b=2#sec-3"),
        (3L, ts("2024-01-01 00:00:20"), "https://other.example.org/p/9?a=1"))
      q.processAllAvailable()
      input.addData( // cross-batch variant of the same page
        (4L, ts("2024-01-01 00:01:00"), "https://news.example.com/p/7?a=1&gclid=g4&b=2"))
      q.processAllAvailable()
      val rows = spark.sql("SELECT doc_id, canonical_url FROM urldedup_out")
        .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
      assert(rows.map(_._1).toSeq === Seq(1L, 3L), "first fetch per canonical wins")
      // the canonical the stream keyed on equals the batch operator's
      val batch = graft.ext.WebOps.canonicalizeUrl(
        Seq((1L, "HTTPS://News.Example.COM:443/p/7?b=2&utm_source=feed&a=1"))
          .toDF("doc_id", "url")).collect()(0).getAs[String]("canonical_url")
      assert(rows.head._2 === batch)
      assert(batch === "https://news.example.com/p/7?a=1&b=2")
    } finally q.stop()
  }

  test("file sink + checkpoint: exactly-once across query restart") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val (in, out, ckpt) = (s"$dir/in", s"$dir/out", s"$dir/ckpt")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("ts",
        org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("event_type",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType)))
    import spark.implicits._
    def writeBatch(name: String, rows: Seq[(Long, String, String, Double)]): Unit =
      rows.map { case (id, t, et, v) => (id, Timestamp.valueOf(t), et, v) }
        .toDF("event_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("append").parquet(in)

    def startQuery() = windowedCounts(
        spark.readStream.schema(schema).parquet(in))
      .withColumn("window_start_s", date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
      .drop("window_start")
      .writeStream.outputMode("append").format("parquet")
      .option("path", out).option("checkpointLocation", ckpt).start()

    writeBatch("b1", Seq((1L, "2024-01-01 00:10:00", "click", 1.0),
      (2L, "2024-01-01 00:20:00", "click", 2.0)))
    val q1 = startQuery()
    q1.processAllAvailable()
    // advance watermark far enough to close the 00:00 window
    writeBatch("b2", Seq((3L, "2024-01-01 05:00:00", "view", 1.0)))
    q1.processAllAvailable()
    q1.stop()
    val afterFirst = spark.read.parquet(out)
      .filter(col("window_start_s") === "2024-01-01 00:00:00").count()
    assert(afterFirst === 1, "00:00 click window must be emitted exactly once")
    // restart from the same checkpoint; add more data; earlier windows must not re-emit
    writeBatch("b3", Seq((4L, "2024-01-01 09:00:00", "view", 1.0)))
    val q2 = startQuery()
    q2.processAllAvailable()
    q2.stop()
    val afterRestart = spark.read.parquet(out)
      .filter(col("window_start_s") === "2024-01-01 00:00:00").count()
    assert(afterRestart === 1, "restart must not duplicate the closed window")
  }

  test("upsert sink: update-mode batches merge into the parquet target by key") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_upsert").toString
    val input = MemoryStream[Event]
    val agg = windowedCounts(input.toDF())
      .withColumn("window_start_s", date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"))
      .drop("window_start")
    val q = upsertParquetSink(agg, s"$dir/target",
      Seq("window_start_s", "event_type"), s"$dir/ckpt")
    try {
      input.addData(
        Event(1, ts("2024-01-01 00:10:00"), 1, "click", 1.0),
        Event(2, ts("2024-01-01 00:20:00"), 1, "click", 2.0))
      q.processAllAvailable()
      // same window updated by a later batch + a new window appears
      input.addData(
        Event(3, ts("2024-01-01 00:30:00"), 1, "click", 3.0),
        Event(4, ts("2024-01-01 01:10:00"), 1, "view", 4.0))
      q.processAllAvailable()
      val rows = spark.read.parquet(s"$dir/target")
        .select("window_start_s", "event_type", "n_events")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      assert(rows === Set(
        ("2024-01-01 00:00:00", "click", 3L), // upserted: 2 → 3
        ("2024-01-01 01:00:00", "view", 1L)))
      // the staged-rename swap must leave no staging directories behind
      val leftovers = new java.io.File(dir).listFiles()
        .map(_.getName).filter(_.contains(".staging-"))
      assert(leftovers.isEmpty, s"staging dirs left behind: ${leftovers.mkString(",")}")
    } finally q.stop()
  }

  test("stream-stream join: time-bounded matches across two live streams") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val lhs = MemoryStream[Event]
    val rhs = MemoryStream[Event]
    val q = streamStreamJoin(lhs.toDF(), rhs.toDF()).writeStream
      .outputMode("append").format("memory").queryName("ssj_out").start()
    try {
      lhs.addData(Event(1, ts("2024-01-01 00:00:00"), 7, "click", 1.0))
      rhs.addData(
        Event(10, ts("2024-01-01 00:30:00"), 7, "view", 1.0),  // within 1h → match
        Event(11, ts("2024-01-01 02:00:00"), 7, "view", 1.0),  // too late → no match
        Event(12, ts("2024-01-01 00:30:00"), 8, "view", 1.0))  // other user → no match
      q.processAllAvailable()
      val rows = spark.sql("SELECT l_id, r_id FROM ssj_out").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(rows === Set((1L, 10L)))
      // agreement with the batch range join on the same rows
      val batch = graft.ext.Events.rangeSelfJoin(ev(
        (1L, "2024-01-01 00:00:00", 7L), (10L, "2024-01-01 00:30:00", 7L),
        (11L, "2024-01-01 02:00:00", 7L), (12L, "2024-01-01 00:30:00", 8L)))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(batch === Set((1L, 10L)))
    } finally q.stop()
  }

  def ev(rows: (Long, String, Long)*): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    rows.map { case (id, t, uid) => (id, ts(t), uid, "click", 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
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

  test("spikeAlerts: finalized spike windows land in the alert sink; calm hours don't") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sc = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_alerts").toString
    // offline reference: 10 calm hours of 2 events → m=2, sd=0 is no good;
    // vary counts 1..3 so sd > 0
    val refEvents = (0 until 9).flatMap { h =>
      (0 until (1 + h % 3)).map(i =>
        (h * 100L + i, ts(f"2024-01-01 $h%02d:05:0$i"), 1L, "click", 1.0, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val refStats = graft.ext.Events.hourlyStats(refEvents)
    val input = MemoryStream[Event]
    val counts = windowedCounts(input.toDF())
    val q = spikeAlerts(counts, refStats, s"$dir/alerts", s"$dir/ckpt")
    try {
      // one calm hour (2 events ≈ mean) then a 40-event spike hour
      input.addData(
        Event(1, ts("2024-02-01 00:10:00"), 1, "click", 1.0),
        Event(2, ts("2024-02-01 00:20:00"), 1, "click", 1.0))
      input.addData((0 until 40).map(i =>
        Event(100L + i, ts(f"2024-02-01 01:${i % 60}%02d:00"), 1L, "click", 1.0)))
      // advance the watermark far enough to finalize both hours
      input.addData(Event(999, ts("2024-02-01 03:00:00"), 1, "click", 1.0))
      q.processAllAvailable()
      val alerts = spark.read.parquet(s"$dir/alerts")
        .select(date_format(col("window_start"), "yyyy-MM-dd HH:mm:ss"),
          col("n_events"), col("z")).collect()
        .map(r => (r.getString(0), r.getLong(1)))
      assert(alerts.toSeq === Seq(("2024-02-01 01:00:00", 40L)),
        "exactly the spike hour alerts; the calm hour does not")
      // agreement with the batch detector over the union of ref + live hours
      val live = Seq(
        (1L, ts("2024-02-01 00:10:00")), (2L, ts("2024-02-01 00:20:00"))) ++
        (0 until 40).map(i => (100L + i, ts(f"2024-02-01 01:${i % 60}%02d:00")))
      val liveDf = live.map { case (id, t) => (id, t, 1L, "click", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val batchSpikes = graft.ext.Events.hourlySpikes(refEvents.unionByName(liveDf))
        .collect().map(_.getString(1))
      assert(batchSpikes.contains("2024-02-01 01:00:00"))
    } finally q.stop()
  }

  test("mediaIngestStream: micro-batch days replay the chained ingestDayFold; replays idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, lit}
    implicit val sc = spark.sqlContext
    import graft.ext.{Curation, Multimodal}
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("doc_id") < 180)
    def pay(df: org.apache.spark.sql.DataFrame): Map[Long, Array[Byte]] =
      df.collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    val imgs = pay(Multimodal.syntheticPngSkewed(spark, base))
    val auds = pay(Multimodal.syntheticWavSkewed(spark, base))
    val vids = pay(Multimodal.syntheticVideoJunk(spark, base))
    val days: Seq[Seq[Long]] =
      Seq((0L until 60L).toSeq, (60L until 120L).toSeq, (120L until 180L).toSeq)
    def rows(ids: Seq[Long]) = ids.map(i => (i, imgs(i), auds(i), vids(i)))

    val dir = java.nio.file.Files.createTempDirectory("graft_ingest_stream").toString
    val (storeDir, auditDir) = (s"$dir/store", s"$dir/audit")
    val input = MemoryStream[(Long, Array[Byte], Array[Byte], Array[Byte])]
    val media = input.toDF().toDF("doc_id", "image", "audio", "video")
    val q = mediaIngestStream(media, storeDir, auditDir, s"$dir/ckpt",
      maxBandBucket = 0)
    try {
      days.foreach { d => input.addData(rows(d)); q.processAllAvailable() }
    } finally q.stop()

    // batch twin: the SAME day slices through the packaged batch loop,
    // both starting from a cold (empty) store
    val foldDir = java.nio.file.Files.createTempDirectory("graft_ingest_fold").toString
    val emptyIds = base.limit(0)
    Curation.ingestStoreInit(spark, foldDir,
      emptyIds.select(col("doc_id"), lit(0L).as("dhash")).limit(0),
      emptyIds.select(col("doc_id"), lit(0L).as("ehash")).limit(0),
      emptyIds.select(col("doc_id"), lit(0).as("slot"),
        lit(0L).as("dhash")).limit(0))
    var auditCols: Seq[String] = Nil
    val foldAudits: Seq[Set[Seq[Any]]] = days.map { d =>
      def m(p: Map[Long, Array[Byte]]) = d.map(i => (i, p(i))).toDF("doc_id", "payload")
      val a = Curation.ingestDayFold(spark, m(imgs), m(auds), m(vids),
        foldDir, maxBandBucket = 0)
      auditCols = a.columns.toSeq
      val r = a.collect().map(_.toSeq).toSet
      a.unpersist(false); r
    }
    // per-day audit parity: the stream's day-N verdicts ARE the batch
    // loop's day-N verdicts (day ids ascend with micro-batch order)
    val streamAudit = spark.read.parquet(auditDir)
    val dayIds = streamAudit.select("day").distinct().collect()
      .map(_.get(0).toString.toLong).sorted
    assert(dayIds.length === days.size, s"one audit partition per day: ${dayIds.toSeq}")
    dayIds.zipWithIndex.foreach { case (dayId, i) =>
      val got = streamAudit.filter(col("day") === dayId)
        .select(auditCols.map(col): _*).collect().map(_.toSeq).toSet
      assert(got === foldAudits(i), s"day $dayId stream audit ≠ batch fold audit")
    }
    // store parity: the day-partitioned stream store holds exactly the
    // flat batch store's fingerprints
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val (sI, sA, sV) = Curation.ingestReadDayStore(spark, storeDir, Long.MaxValue)
    // collect the pre-replay store ONCE: the replay below rewrites the
    // day partitions, so these frames' file lists go stale
    val (setI, setA, setV) = (rowSet(sI), rowSet(sA), rowSet(sV))
    val (fI, fA, fV) = Curation.ingestReadStore(spark, foldDir)
    assert(setI === rowSet(fI), "image store parity")
    assert(setA === rowSet(fA), "audio store parity")
    assert(setV === rowSet(fV.select("doc_id", "slot", "dhash")), "video store parity")

    // replay contract: re-delivering the LAST day (a foreachBatch crash
    // between commit and checkpoint) must leave store and audit
    // byte-identical — overwrite-by-day replaces the first attempt, and
    // the day<N store read keeps the replay from seeing its own fold
    val auditBefore = rowSet(streamAudit)
    Curation.ingestStreamDay(spark,
      rows(days.last).toDF("doc_id", "image", "audio", "video"),
      dayIds.last, storeDir, auditDir, maxBandBucket = 0)
    val (rI, rA, rV) = Curation.ingestReadDayStore(spark, storeDir, Long.MaxValue)
    assert(rowSet(rI) === setI && rowSet(rA) === setA &&
      rowSet(rV) === setV, "replayed day must not change the store")
    assert(rowSet(spark.read.parquet(auditDir)) === auditBefore,
      "replayed day must not change the audit")
  }

  test("embeddingIngestStream: micro-batch days replay embeddingIngestDayFold; " +
      "replays idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, md5, substring}
    implicit val sc = spark.sqlContext
    import graft.ext.Similarity
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val storedSide = substring(md5(col("vec_id").cast("string")), 1, 1) < "8"
    val sVecs = emb.filter(storedSide)
    val arrivals = emb.filter(!storedSide).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val days = Seq(
      arrivals.filter(_._1 < 170).toSeq,
      arrivals.filter(t => t._1 >= 170 && t._1 < 340).toSeq,
      arrivals.filter(_._1 >= 340).toSeq)

    val dir = java.nio.file.Files.createTempDirectory("graft_emb_stream").toString
    val (storeDir, auditDir) = (s"$dir/store", s"$dir/audit")
    // seed the day-partitioned store at day=-1 (visible to every batch)
    // with the same exemplar collapse as embeddingIngestStoreInit
    val seed = Similarity.quantizedCodes(sVecs).filter(col("qsq") > 0)
    val seedEx = seed.groupBy("dig")
      .agg(org.apache.spark.sql.functions.min(col("vec_id")).as("vec_id"))
    seed.join(seedEx, Seq("dig", "vec_id"))
      .select("vec_id", "qv", "qsq", "dig")
      .write.parquet(s"$storeDir/codes/day=-1")
    val input = MemoryStream[(Long, Seq[Float])]
    val q = embeddingIngestStream(input.toDF().toDF("vec_id", "embedding"),
      storeDir, auditDir, s"$dir/ckpt")
    try {
      days.foreach { d => input.addData(d); q.processAllAvailable() }
    } finally q.stop()

    // batch twin: the SAME day slices through the flat-store fold
    val foldDir = java.nio.file.Files.createTempDirectory("graft_emb_fold").toString
    Similarity.embeddingIngestStoreInit(sVecs, foldDir)
    var auditCols: Seq[String] = Nil
    val foldAudits = days.map { d =>
      val ids = d.map(_._1)
      val a = Similarity.embeddingIngestDayFold(spark,
        emb.filter(!storedSide).filter(col("vec_id").isin(ids: _*)), foldDir)
      auditCols = a.columns.toSeq
      val r = a.collect().map(_.toSeq).toSet
      a.unpersist(false); r
    }
    val streamAudit = spark.read.parquet(auditDir)
    val dayIds = streamAudit.select("day").distinct().collect()
      .map(_.get(0).toString.toLong).sorted
    assert(dayIds.length === days.size, s"one audit partition per day: ${dayIds.toSeq}")
    dayIds.zipWithIndex.foreach { case (dayId, i) =>
      val got = streamAudit.filter(col("day") === dayId)
        .select(auditCols.map(col): _*).collect().map(_.toSeq).toSet
      assert(got === foldAudits(i), s"day $dayId stream audit ≠ batch fold audit")
    }
    // store parity on the code CONTENT each regime accumulated
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "qv", "qsq", "dig").collect().map(_.toSeq).toSet
    val fold = Similarity.embeddingIngestReadStore(spark, foldDir)
    val stream = Similarity.embeddingIngestReadDayStore(spark, storeDir, Long.MaxValue)
    val streamSet = rowSet(stream)
    assert(streamSet === rowSet(fold), "code store parity")

    // replay contract: re-delivering the last day replaces its output
    val auditBefore = streamAudit.collect().map(_.toSeq).toSet
    Similarity.embeddingIngestStreamDay(spark,
      days.last.toDF("vec_id", "embedding"), dayIds.last, storeDir, auditDir)
    assert(rowSet(Similarity.embeddingIngestReadDayStore(spark, storeDir,
      Long.MaxValue)) === streamSet, "replayed day must not change the store")
    assert(spark.read.parquet(auditDir).collect().map(_.toSeq).toSet === auditBefore,
      "replayed day must not change the audit")
  }

  test("docIngestStream: micro-batch days replay docIngestDayFold; replays idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, conv, md5, substring}
    implicit val sc = spark.sqlContext
    import graft.ext.{Curation, Dedup, TextOps, WebOps}
    val docs = TextOps.withSyntheticDupText(WebOps.withSyntheticMessyUrl(
      graft.Tables.documents(spark, "/root/testdata/sf0.001")))
    val stored = conv(substring(md5(col("doc_id").cast("string")), 1, 2),
      16, 10).cast("int") % 3 === 0
    val sDocs = docs.filter(stored)
    val sU = WebOps.canonicalizeUrl(sDocs).select("canonical_url")
    val sT = sDocs.select(md5(col("text")).as("text_md5"))
    val sS = Dedup.minhashSignaturesMd5(Dedup.shingles(sDocs), numHashes = 16)
    val arrivals = docs.filter(!stored).select("doc_id", "text", "url")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val days = Seq(
      arrivals.filter(_._1 < 170).toSeq,
      arrivals.filter(t => t._1 >= 170 && t._1 < 340).toSeq,
      arrivals.filter(_._1 >= 340).toSeq)

    val dir = java.nio.file.Files.createTempDirectory("graft_doc_stream").toString
    val (storeDir, auditDir) = (s"$dir/store", s"$dir/audit")
    // seed the day-partitioned store with the initial corpus at day=-1
    // (every micro-batch N reads day < N, so the seed is visible to all)
    sU.write.parquet(s"$storeDir/urls/day=-1")
    sT.write.parquet(s"$storeDir/texts/day=-1")
    sS.write.parquet(s"$storeDir/sigs/day=-1")
    val input = MemoryStream[(Long, String, String)]
    val q = docIngestStream(input.toDF().toDF("doc_id", "text", "url"),
      storeDir, auditDir, s"$dir/ckpt")
    try {
      days.foreach { d => input.addData(d); q.processAllAvailable() }
    } finally q.stop()

    // batch twin: the SAME day slices through the flat-store fold
    val foldDir = java.nio.file.Files.createTempDirectory("graft_doc_fold").toString
    Curation.docIngestStoreInit(spark, foldDir, sU, sT, sS)
    var auditCols: Seq[String] = Nil
    val foldAudits = days.map { d =>
      val ids = d.map(_._1)
      val a = Curation.docIngestDayFold(spark,
        docs.filter(!stored).filter(col("doc_id").isin(ids: _*)), foldDir)
      auditCols = a.columns.toSeq
      val r = a.collect().map(_.toSeq).toSet
      a.unpersist(false); r
    }
    val streamAudit = spark.read.parquet(auditDir)
    val dayIds = streamAudit.select("day").distinct().collect()
      .map(_.get(0).toString.toLong).sorted
    assert(dayIds.length === days.size, s"one audit partition per day: ${dayIds.toSeq}")
    dayIds.zipWithIndex.foreach { case (dayId, i) =>
      val got = streamAudit.filter(col("day") === dayId)
        .select(auditCols.map(col): _*).collect().map(_.toSeq).toSet
      assert(got === foldAudits(i), s"day $dayId stream audit ≠ batch fold audit")
    }
    // store parity on the fingerprint CONTENT each regime accumulated
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSet
    val (fU, fT, fS) = Curation.docIngestReadStore(spark, foldDir)
    val (gU, gT, gS) = Curation.docIngestReadDayStore(spark, storeDir, Long.MaxValue)
    val (setU, setT, setS) = (rowSet(gU), rowSet(gT), rowSet(gS))
    assert(setU === rowSet(fU), "url store parity")
    assert(setT === rowSet(fT), "text store parity")
    assert(setS === rowSet(fS.select("doc_id", "sig")), "sig store parity")

    // replay contract: re-delivering the last day replaces its output
    val auditBefore = rowSet(streamAudit)
    Curation.docIngestStreamDay(spark,
      days.last.toDF("doc_id", "text", "url"), dayIds.last, storeDir, auditDir)
    val (rU, rT, rS) = Curation.docIngestReadDayStore(spark, storeDir, Long.MaxValue)
    assert(rowSet(rU) === setU && rowSet(rT) === setT && rowSet(rS) === setS,
      "replayed day must not change the store")
    assert(rowSet(spark.read.parquet(auditDir)) === auditBefore,
      "replayed day must not change the audit")
  }

  test("bm25IngestStream: streamed lexical days serve the union ranking " +
      "through foreachBatch; replays idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, md5, substring}
    implicit val sc = spark.sqlContext
    import graft.ext.TextOps
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val storedSide = substring(md5(col("doc_id").cast("string")), 1, 1) < "8"
    val arrivals = d.filter(!storedSide).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val days = Seq(
      arrivals.filter(_._1 < 250).toSeq,
      arrivals.filter(_._1 >= 250).toSeq)
    val dir = java.nio.file.Files.createTempDirectory("graft_lex_fb").toString
    TextOps.bm25IndexInit(d.filter(storedSide), dir)
    val input = MemoryStream[(Long, String)]
    val q = bm25IngestStream(input.toDF().toDF("doc_id", "text"),
      dir, s"$dir/ckpt")
    try {
      days.foreach { day => input.addData(day); q.processAllAvailable() }
    } finally q.stop()
    // the streamed store serves the UNION ranking exactly
    val brute = TextOps.bm25TopDocs(d).collect().map(_.toSeq)
    assert(TextOps.bm25StoreTopDocs(spark, dir).collect().map(_.toSeq)
      .toSeq === brute.toSeq)
    // replay: re-delivering the last day must not change the ranking
    TextOps.bm25IndexStreamDay(spark,
      days.last.toDF("doc_id", "text"), 1L, dir)
    assert(TextOps.bm25StoreTopDocs(spark, dir).collect().map(_.toSeq)
      .toSeq === brute.toSeq)
  }

  test("ivfIndexIngestStream: streamed day assignments equal the batch " +
      "assignment under fixed centroids; replays idempotent") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, md5, substring}
    implicit val sc = spark.sqlContext
    import graft.ext.Similarity
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val storedSide = substring(md5(col("vec_id").cast("string")), 1, 1) < "8"
    val arrivals = emb.filter(!storedSide).select("vec_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1)))
    val days = Seq(
      arrivals.filter(_._1 < 170).toSeq,
      arrivals.filter(t => t._1 >= 170 && t._1 < 340).toSeq,
      arrivals.filter(_._1 >= 340).toSeq)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_stream").toString
    Similarity.ivfIndexStoreInit(emb.filter(storedSide), dir)
    val input = MemoryStream[(Long, Seq[Float])]
    val q = ivfIndexIngestStream(input.toDF().toDF("vec_id", "embedding"),
      dir, s"$dir/ckpt")
    try {
      days.foreach { d => input.addData(d); q.processAllAvailable() }
    } finally q.stop()
    // the store holds PACKED codes (qb binary) — byte arrays compare by
    // reference in Row.toSeq sets, so parity is checked on the
    // non-binary columns, with dig (the md5 code digest) standing in
    // for the code content
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "qsq", "dig", "centroid_id", "centroid_sim")
        .collect().map(_.toSeq).toSet
    // fixed centroids make the streamed union EQUAL the one-batch
    // assignment — an identity, not a fold law
    val streamed = Similarity.ivfIndexReadDayAssignments(spark, dir)
    val streamedSet = rowSet(streamed)
    val batch = Similarity.ivfIndexAssign(emb.filter(!storedSide),
      Similarity.ivfIndexStoreCentroids(spark, dir))
    assert(streamedSet === rowSet(batch),
      "streamed days must equal the batch assignment")
    assert(streamedSet.nonEmpty)
    // probes prune by list id ACROSS day partitions
    val probed = spark.read.parquet(s"$dir/day_assignments")
      .filter(col("centroid_id") === 0)
      .select(org.apache.spark.sql.functions.input_file_name())
      .distinct().collect().map(_.getString(0))
    probed.foreach(f => assert(f.contains("centroid_id=0"),
      s"day-layered probe must prune to the probed list: $f"))
    // replay contract: a day reads no store, so re-delivery rewrites
    // its own partition with identical facts
    Similarity.ivfIndexStreamDay(spark,
      days.last.toDF("vec_id", "embedding"), 2L, dir)
    assert(rowSet(Similarity.ivfIndexReadDayAssignments(spark, dir)) === streamedSet,
      "replayed day must not change the index")
  }
}
