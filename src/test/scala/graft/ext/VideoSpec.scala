package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, Tables}

/** The GVID video tier: container codec, full/selective decode, uniform
  * frame sampling, per-frame fingerprints, scene cuts, and banded
  * near-dup — the video member of the multimodal family.
  */
class VideoSpec extends AnyFunSuite with SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("GVID codec: encode/decode round-trip is bit-exact; probe reads only the header") {
    val frames = (0 until 5).map { f =>
      Multimodal.PngCodec.encode(9, 8, (x, y) => (f * 37 + x * 11 + y * 7) % (1 << 24))
    }
    val gvid = Multimodal.VideoCodec.encode(24, frames)
    val (fps, decoded) = Multimodal.VideoCodec.decode(gvid)
    assert(fps === 24)
    assert(decoded.length === 5)
    decoded.zip(frames).foreach { case (d, o) =>
      assert(java.util.Arrays.equals(d, o), "frame bytes must round-trip bit-exactly")
    }
    assert(Multimodal.VideoCodec.probe(gvid) === ((24, 5)))
    // a non-GVID payload is rejected, not misparsed
    intercept[IllegalArgumentException] {
      Multimodal.VideoCodec.decode("not a video".getBytes("UTF-8"))
    }
  }

  test("GVID selective decode: decodeFrames returns exactly the wanted frames, in order") {
    val frames = (0 until 7).map { f =>
      Multimodal.PngCodec.encode(8, 8, (x, y) => (f * 97 + x + y) % (1 << 24))
    }
    val gvid = Multimodal.VideoCodec.encode(12, frames)
    val got = Multimodal.VideoCodec.decodeFrames(gvid, Seq(0, 3, 6))
    assert(got.map(_._1) === Seq(0, 3, 6))
    got.foreach { case (i, bytes) =>
      assert(java.util.Arrays.equals(bytes, frames(i)), s"frame $i")
    }
    // indices past the end are ignored, not an error
    assert(Multimodal.VideoCodec.decodeFrames(gvid, Seq(2, 99)).map(_._1) === Seq(2))
  }

  test("decodeVideoFeatures: decoded per-frame pixel sums match the closed form; narrow plan") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.syntheticVideoTable(spark, docs)
    val feats = Multimodal.decodeVideoFeatures(spark, media)
    val rows = feats.collect()
    val n = docs.count()
    assert(rows.map(_.getLong(0)).distinct.length === n)
    // independent reference: replay the pattern in plain Scala
    rows.foreach { r =>
      val id = r.getLong(0); val fr = r.getInt(1)
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      assert(r.getInt(2) === (10 + (id % 3) * 5).toInt, "fps")
      assert(r.getInt(3) === w && r.getInt(4) === h)
      var sr = 0L; var sg = 0L; var sb = 0L
      for (x <- 0 until w; y <- 0 until h) {
        sr += (id * 7 + fr * 19 + x * 3 + y * 5) % 256
        sg += (id * 11 + fr * 23 + x + y * 2) % 256
        sb += (id * 13 + fr * 29 + x * 4 + y) % 256
      }
      assert(r.getLong(5) === sr && r.getLong(6) === sg && r.getLong(7) === sb,
        s"doc $id frame $fr")
    }
    // frame counts follow the fixture
    rows.groupBy(_.getLong(0)).foreach { case (id, g) =>
      assert(g.length === (4 + id % 5).toInt, s"doc $id frame count")
    }
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
  }

  test("videoFrameSample: slot layout is (slot*n) div 4; only sampled frames decoded; narrow") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.syntheticVideoTable(spark, docs)
    val sampled = Multimodal.videoFrameSample(spark, media)
    val rows = sampled.collect()
    rows.foreach { r =>
      val id = r.getLong(0); val slot = r.getInt(1); val fr = r.getInt(2)
      val n = (4 + id % 5).toInt
      assert(fr === slot * n / 4, s"doc $id slot $slot")
    }
    rows.groupBy(_.getLong(0)).foreach { case (id, g) =>
      assert(g.map(_.getInt(1)).sorted === Seq(0, 1, 2, 3), s"doc $id slots")
    }
    val plan = sampled.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"sampling must not shuffle:\n$plan")
  }

  test("videoPhash: slot hashes equal dhashOf of the sampled frames; 63-bit; narrow") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.syntheticVideoTable(spark, docs)
    val hashes = Multimodal.videoPhash(spark, media)
    val rows = hashes.collect()
    assert(rows.forall(_.getLong(3) >= 0L), "63-bit hash never touches the sign bit")
    // independent check on a handful of videos: decode the container
    // directly and hash the sampled frames with the image kernel
    val payloads = media.filter("doc_id < 8").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    payloads.foreach { case (id, gvid) =>
      val (_, frames) = Multimodal.VideoCodec.decode(gvid)
      val n = frames.length
      val expected = (0 until 4).map(j => Multimodal.dhashOf(frames(j * n / 4)))
      val got = rows.filter(_.getLong(0) == id).sortBy(_.getInt(1)).map(_.getLong(3)).toSeq
      assert(got === expected, s"doc $id")
    }
    val plan = hashes.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fingerprinting must not shuffle:\n$plan")
  }

  test("videoScenes: cuts are exactly the planted scene boundaries; one exchange on doc_id") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.syntheticVideoScenes(spark, docs)
    val scenes = Multimodal.videoScenes(spark, media)
    val rows = scenes.collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      val id = r.getLong(0); val n = (6 + id % 7).toInt
      assert(r.getInt(1) === n, s"doc $id n_frames")
      // scene boundaries at frames 3, 6, 9, ... below n
      assert(r.getInt(2) === (n - 1) / 3, s"doc $id n_cuts")
    }
    // the window is per-video: partitioned by doc_id, never a global sort
    val plan = scenes.queryExecution.executedPlan.toString
    assert(!plan.contains("No Partition Defined"), "window must be keyed by doc_id")
  }

  test("videoNearDup: exactly the planted clusters; auto cap agrees with guard-off here") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.syntheticVideoClusters(spark, docs)
    val pairs = Multimodal.videoNearDup(spark, media, maxBandBucket = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val n = docs.count()
    val expected = (for {
      a <- 0L until n; b <- (a + 1) until n
      if a % 50 == b % 50
    } yield (a, b)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet === expected)
    assert(pairs.forall(_._3 <= 1), "in-cluster total Hamming is at most the bump bit")
    pairs.foreach { case (a, b, _) => assert(a % 50 === b % 50) }
    // the non-degenerate bed never trips the auto cap: same output
    val auto = Multimodal.videoNearDup(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(auto.toSet === pairs.toSet)
    Multimodal.videoNearDup(spark, media).unpersist(false)
  }

  test("short videos still get k fixed-width slots (frames repeat, decoded once)") {
    import spark.implicits._
    def video(nFrames: Int, seed: Int): Array[Byte] = {
      val frames = (0 until nFrames).map { f =>
        Multimodal.PngCodec.encode(8, 8, (x, y) => (seed * 83 + f * 97 + x * 11 + y * 7) % (1 << 24))
      }
      Multimodal.VideoCodec.encode(12, frames)
    }
    val media = Seq((1L, video(1, 1)), (2L, video(2, 2)), (3L, video(7, 3)))
      .toDF("doc_id", "payload")
    val hashes = Multimodal.videoPhash(spark, media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // every video yields exactly slots 0..3 regardless of frame count
    hashes.groupBy(_._1).foreach { case (id, g) =>
      assert(g.map(_._2).sorted === Seq(0, 1, 2, 3), s"doc $id slots")
    }
    // 1-frame video: all slots map to frame 0 with one shared hash
    val one = hashes.filter(_._1 == 1L)
    assert(one.map(_._3).toSet === Set(0))
    assert(one.map(_._4).toSet.size === 1)
    // 2-frame video: slots 0,1 -> frame 0; slots 2,3 -> frame 1
    val two = hashes.filter(_._1 == 2L).sortBy(_._2)
    assert(two.map(_._3).toSeq === Seq(0, 0, 1, 1))
    // frame sampling agrees on the layout
    val sampled = Multimodal.videoFrameSample(spark, media).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(sampled.filter(_._1 == 2L).sortBy(_._2).map(_._3).toSeq === Seq(0, 0, 1, 1))
    // two byte-identical 1-frame videos are a near-dup pair (all four
    // slots share the repeated frame's hash — the pigeonhole still holds)
    val dupMedia = Seq((10L, video(1, 9)), (11L, video(1, 9)))
      .toDF("doc_id", "payload")
    val pairs = Multimodal.videoNearDup(spark, dupMedia, maxBandBucket = 0).collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
      === Seq((10L, 11L, 0)))
  }

  test("videoNearDupIncremental: only pairs with a new side; agrees with the full run") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.syntheticVideoClusters(spark, docs)
    val stored = Multimodal.videoPhash(spark, media.filter(col("doc_id") < 250))
      .select("doc_id", "slot", "dhash")
    val inc = Multimodal.videoNearDupIncremental(spark,
      media.filter(col("doc_id") >= 250), stored).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getBoolean(3)))).toMap
    assert(inc.nonEmpty)
    inc.foreach { case ((a, b), (_, cross)) =>
      assert(a >= 250 || b >= 250)
      assert(cross === ((a < 250) != (b < 250)))
    }
    // the incremental view is exactly the full pair set minus stored-stored
    val full = Multimodal.videoNearDup(spark, media).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val expected = full.filter { case ((a, b), _) => a >= 250 || b >= 250 }
    assert(inc.keySet === expected.keySet)
    inc.foreach { case (k, (hamming, _)) => assert(hamming === expected(k)) }
    Multimodal.videoNearDup(spark, media).unpersist(false)
  }

  test("videoClusters: every planted cluster recovered with min-id label") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.syntheticVideoClusters(spark, docs)
    val rows = Multimodal.videoClusters(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = docs.count()
    // 500 docs / 50 residue classes -> every doc is in a 10-video cluster
    assert(rows.length === n)
    rows.foreach { case (id, cluster, size) =>
      assert(cluster === id % 50, s"doc $id label")
      assert(size === n / 50, s"doc $id size")
    }
  }

  test("videoNearDup pigeonhole precondition is enforced") {
    val docs = Tables.documents(spark, sf)
    val media = Multimodal.syntheticVideoClusters(spark, docs)
    intercept[IllegalArgumentException] {
      Multimodal.videoNearDup(spark, media, k = 4, maxTotalHamming = 4)
    }
  }

  test("videoNearDup band-bucket cap bounds a degenerate all-flat corpus with no parameter") {
    import spark.implicits._
    // flat (constant-color) frames: every slot hash is all-zeros, so
    // the whole corpus piles into the (slot, 0) buckets — the video
    // twin of the flat-image bed. Color varies per doc and per frame.
    def flatVideo(id: Long): Array[Byte] = {
      val frames = (0 until 4).map { f =>
        val c = ((id * 31 + f * 7) % 256).toInt
        Multimodal.PngCodec.encode(12, 12, (_, _) => (c << 16) | (c << 8) | c)
      }
      Multimodal.VideoCodec.encode(12, frames)
    }
    // planted pair: the high-frequency cluster pattern, one member with
    // a corner bump on frame 0 — total Hamming <= 1, far from all-zeros
    def clusterVideo(bump: Int): Array[Byte] = {
      val key = 7L
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
    val media = ((1L to 200L).map(id => (id, flatVideo(id))) ++
      Seq((1001L, clusterVideo(0)), (1002L, clusterVideo(5))))
      .toDF("doc_id", "payload")
    // guard off: all-pairs volume among the 200 flat videos + the pair
    val uncapped = Multimodal.videoNearDup(spark, media, maxBandBucket = 0).collect()
    assert(uncapped.length === 200 * 199 / 2 + 1,
      "guard off: all-pairs volume in the flat bucket")
    // auto cap (202 videos × 4 slots = 808 rows -> cap ~64 < 200):
    // the flat buckets are dropped with NO caller parameter while the
    // planted pair's 2-strong buckets survive
    val auto = Multimodal.videoNearDup(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(auto.toSeq === Seq((1001L, 1002L)),
      "auto cap must bound the flat corpus with no parameter")
  }
}
