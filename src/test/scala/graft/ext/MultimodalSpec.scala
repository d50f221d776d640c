package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, Tables}

class MultimodalSpec extends AnyFunSuite with SparkSpec {

  test("media table: payload is binary, metadata struct is typed") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, "/root/testdata/sf0.001"))
    val schema = media.schema
    assert(schema("payload").dataType === org.apache.spark.sql.types.BinaryType)
    val meta = schema("meta").dataType.asInstanceOf[org.apache.spark.sql.types.StructType]
    assert(meta.fieldNames.toSeq === Seq("media_type", "width_px", "height_px", "source_id"))
  }

  test("feature extraction: deterministic fake codec, byte-exact mean") {
    import spark.implicits._
    val docs = Seq((1L, "ab", "en", "src0", 2L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val feats = Multimodal.extractFeatures(spark, Multimodal.toMediaTable(docs)).collect()
    assert(feats.length === 1)
    assert(feats(0).nBytes === 2)
    assert(feats(0).meanByte === (97.0 + 98.0) / 2) // 'a'=97, 'b'=98
  }

  test("frame sampling + resize: one row per frame, bounded feature width") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, "/root/testdata/sf0.001"))
    val frames = Multimodal.sampleFrames(spark, media, nFrames = 4, resizeTo = 16)
    val rows = frames.collect()
    assert(rows.nonEmpty)
    val perDoc = rows.groupBy(_.getLong(0))
    assert(perDoc.values.forall(g => g.length <= 4))
    assert(rows.forall(_.getSeq[Double](3).length <= 16))
    // deterministic: same input → same features
    val again = Multimodal.sampleFrames(spark, media, nFrames = 4, resizeTo = 16).collect()
    assert(rows.map(_.toSeq).toSet === again.map(_.toSeq).toSet)
  }

  test("extraction is a narrow transformation (no shuffle) over all partitions") {
    val media = Multimodal.toMediaTable(Tables.documents(spark, "/root/testdata/sf0.001"))
    val feats = Multimodal.extractFeatures(spark, media)
    assert(feats.count() === 500)
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
  }

  test("aspectBatches: full batches except per-bucket tails; every item batched once") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.toMediaTable(docs)
    val batches = Multimodal.aspectBatches(media, batchSize = 8).collect()
    assert(batches.map(_.getLong(2)).sum === docs.count(), "items conserved")
    // within each bucket, only the highest batch_id may be short
    batches.groupBy(r => Option(r.get(0))).foreach { case (_, g) =>
      val maxBatch = g.map(_.getLong(1)).max
      g.foreach { r =>
        if (r.getLong(1) < maxBatch)
          assert(r.getLong(2) === 8L, s"non-tail batch must be full: $r")
        assert(r.getLong(2) <= 8L)
      }
    }
    // doc ranges of consecutive batches in a bucket never overlap
    batches.groupBy(r => Option(r.get(0))).foreach { case (_, g) =>
      g.sortBy(_.getLong(1)).sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(4) < b.getLong(3))
        case _ =>
      }
    }
  }

  test("PNG codec: payloads are real PNGs and decoded pixels match the pattern exactly") {
    import spark.implicits._
    val docs = Seq((3L, "x", "en", "src0", 1L), (10L, "y", "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.syntheticPngTable(spark, docs)
    val payloads = media.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    // PNG signature: 0x89 'P' 'N' 'G'
    payloads.values.foreach { png =>
      assert((png(0) & 0xFF) === 0x89 && png(1) === 'P'.toByte &&
        png(2) === 'N'.toByte && png(3) === 'G'.toByte, "payload must be a real PNG")
    }
    val feats = Multimodal.decodePngFeatures(spark, media).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(3L, 10L)) {
      val w = (8 + id % 9).toInt; val h = (8 + id % 7).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += (id * 7 + x * 3 + y * 5) % 256
        sg += (id * 11 + x + y * 2) % 256
        sb += (id * 13 + x * 4 + y) % 256
      }
      val r = feats(id)
      assert((r.getInt(1), r.getInt(2), r.getLong(3)) === ((w, h, w.toLong * h)))
      assert((r.getLong(4), r.getLong(5), r.getLong(6)) === ((sr, sg, sb)),
        s"decoded channel sums must equal the closed form for doc $id")
    }
  }

  test("PNG encode + decode stages are shuffle-free (narrow mapPartitions)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Multimodal.decodePngFeatures(spark,
      Multimodal.syntheticPngTable(spark, docs)).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"codec pipeline must not shuffle:\n$plan")
  }

  test("JPEG lossy tier: real JPEGs, bounded reconstruction error, deterministic") {
    import spark.implicits._
    val docs = Seq((3L, "x", "en", "src0", 1L), (10L, "y", "en", "src0", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val media = Multimodal.syntheticJpegTable(spark, docs)
    val payloads = media.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    // JPEG/JFIF signature: 0xFF 0xD8 0xFF
    payloads.values.foreach { jpg =>
      assert((jpg(0) & 0xFF) === 0xFF && (jpg(1) & 0xFF) === 0xD8 &&
        (jpg(2) & 0xFF) === 0xFF, "payload must be a real JPEG")
    }
    val feats = Multimodal.decodeImageFeatures(spark, media).collect()
      .map(r => r.getLong(0) -> r).toMap
    for (id <- Seq(3L, 10L)) {
      val w = (16 + id % 9).toInt; val h = (16 + id % 7).toInt
      var sr = 0L; var sg = 0L; var sb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        sr += ((id * 7) % 64 + x * 2 + y) % 256
        sg += ((id * 11) % 64 + x + y * 2) % 256
        sb += ((id * 13) % 64 + x + y) % 256
      }
      val r = feats(id)
      assert((r.getInt(1), r.getInt(2), r.getLong(3)) === ((w, h, w.toLong * h)),
        "dimensions survive the lossy round-trip exactly")
      // lossy codec: per-channel MEAN reconstruction error stays small
      // on the smooth-gradient fixture (DCT error lives in high
      // frequencies); 8 gray levels per pixel is a generous envelope
      val n = w.toLong * h
      for ((got, want, ch) <- Seq((r.getLong(4), sr, "r"),
          (r.getLong(5), sg, "g"), (r.getLong(6), sb, "b")))
        assert(math.abs(got - want) <= 8 * n,
          s"channel $ch of doc $id drifted ${math.abs(got - want)} over $n px")
    }
    // same JVM encoder + deterministic pattern -> byte-identical reruns
    val again = Multimodal.syntheticJpegTable(spark, docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("payload")).toMap
    for (id <- Seq(3L, 10L))
      assert(java.util.Arrays.equals(payloads(id), again(id)),
        "JPEG encode must be rerun-deterministic")
    val plan = Multimodal.decodeImageFeatures(spark,
      Multimodal.syntheticJpegTable(spark, docs))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"codec pipeline must not shuffle:\n$plan")
  }

  test("jpegBoundsAudit: all bounds hold on the fixture, and the bounds can bite") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 40)
    val media = Multimodal.syntheticJpegTable(spark, docs)
    val rows = Multimodal.jpegBoundsAudit(spark, media).collect()
    assert(rows.length === 40)
    val flagCols = Seq("width_ok", "height_ok", "err_r_ok", "err_g_ok",
      "err_b_ok", "decode_deterministic")
    rows.foreach { r =>
      flagCols.foreach(c => assert(r.getAs[Boolean](c),
        s"doc ${r.getLong(0)}: $c must hold at the documented tolerance"))
      val w = (16 + r.getLong(0) % 9).toInt
      val h = (16 + r.getLong(0) % 7).toInt
      assert((r.getInt(1), r.getInt(2), r.getLong(3)) === ((w, h, w.toLong * h)))
    }
    // the error booleans are real measurements, not constants: JPEG is
    // lossy, so a zero tolerance must falsify at least one channel bound
    val strict = Multimodal.jpegBoundsAudit(spark, media, tolerance = 0L)
      .collect()
    assert(strict.exists(r => Seq("err_r_ok", "err_g_ok", "err_b_ok")
      .exists(c => !r.getAs[Boolean](c))),
      "zero tolerance must falsify a channel bound on a lossy codec")
  }

  test("imageDhash: decoded-pixel hash matches closed form; hashing is shuffle-free") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticPngClusters(spark, docs)
    val got = Multimodal.imageDhash(spark, media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent reference: replay the pattern + grid + luma + bits in
    // plain Scala (no Spark, no codec) — the decode path must agree
    def ref(id: Long): Long = {
      val key = id % 50; val bump = (id / 50).toInt
      val w = (8 + key % 9).toInt; val h = (8 + key % 7).toInt
      def r(x: Int, y: Int): Int = {
        val v = ((key * 7 + x * 37 + y * 59 + x * y * 13) % 256).toInt
        if (x == 0 && y == 0) (v + bump) % 256 else v
      }
      def g(x: Int, y: Int): Int = ((key * 11 + x * 23 + y * 41 + x * y * 7) % 256).toInt
      def b(x: Int, y: Int): Int = ((key * 13 + x * 29 + y * 31 + x * y * 17) % 256).toInt
      var hash = 0L
      for (j <- 0 until 7) {
        val y = ((2 * j + 1) * h) / 14
        var prev = 0L
        for (i <- 0 until 10) {
          val x = ((2 * i + 1) * w) / 20
          val l = 299L * r(x, y) + 587L * g(x, y) + 114L * b(x, y)
          if (i > 0 && l > prev) hash |= 1L << (j * 9 + (i - 1))
          prev = l
        }
      }
      hash
    }
    assert(got.nonEmpty)
    got.foreach { case (id, hsh) => assert(hsh === ref(id), s"doc $id") }
    assert(got.values.forall(_ >= 0L), "63-bit hash never touches the sign bit")
    val plan = Multimodal.imageDhash(spark, media)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hashing must not shuffle:\n$plan")
  }

  test("imageNearDup: exactly the planted clusters, nothing across them") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticPngClusters(spark, docs)
    val pairs = Multimodal.imageNearDup(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val n = docs.count()
    // every same-residue pair is a planted perceptual dup (corner bump
    // moves <= 1 dHash sample); distinct clusters sit >= 13 bits apart
    val expected = (for {
      a <- 0L until n; b <- (a + 1) until n
      if a % 50 == b % 50
    } yield (a, b)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet === expected)
    assert(pairs.forall(_._3 <= 1), "in-cluster Hamming distance is at most the bump bit")
  }

  test("imageNearDupIncremental: only pairs with a new side; classes agree with full run") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticPngClusters(spark, docs)
    val stored = Multimodal.imageDhash(spark, media.filter(col("doc_id") < 250))
    val inc = Multimodal.imageNearDupIncremental(spark,
      media.filter(col("doc_id") >= 250), stored).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getBoolean(3)))).toMap
    assert(inc.nonEmpty)
    // every emitted pair involves >= 1 new doc; is_cross = exactly one new
    inc.foreach { case ((a, b), (_, cross)) =>
      assert(a >= 250 || b >= 250)
      assert(cross === ((a < 250) != (b < 250)))
    }
    // the incremental view is exactly the full pair set minus stored-stored
    val full = Multimodal.imageNearDup(spark, media).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val expected = full.filter { case ((a, b), _) => a >= 250 || b >= 250 }
    assert(inc.keySet === expected.keySet)
    inc.foreach { case (k, (hamming, _)) => assert(hamming === expected(k)) }
  }

  test("image near-dup band-bucket cap bounds the flat-image corpus blowup (batch + incremental)") {
    import spark.implicits._
    // flat (constant-color) images: every intra-row luma comparison is
    // false, so ALL of them share the all-zeros dHash — the image twin
    // of DedupSpec's empty-document simhash bed. Color varies per doc
    // to show the degeneracy is structural, not a payload-equality dup.
    def flatPng(id: Long): Array[Byte] = {
      val c = ((id * 31) % 256).toInt
      Multimodal.PngCodec.encode(16, 16, (_, _) => (c << 16) | (c << 8) | c)
    }
    // planted near-dup pair: the high-frequency cluster pattern from
    // syntheticPngClusters (key fixed), corner-bump perturbation on one
    // member -> in-pair Hamming <= 1, ~half the 63 bits set so the pair
    // sits tens of bits from the flat images' all-zeros hash
    def clusterPng(bump: Int): Array[Byte] = {
      val key = 7L
      val w = (8 + key % 9).toInt; val h = (8 + key % 7).toInt
      Multimodal.PngCodec.encode(w, h, (x, y) => {
        val r0 = ((key * 7 + x * 37 + y * 59 + x * y * 13) % 256).toInt
        val r = if (x == 0 && y == 0) (r0 + bump) % 256 else r0
        val g = ((key * 11 + x * 23 + y * 41 + x * y * 7) % 256).toInt
        val b = ((key * 13 + x * 29 + y * 31 + x * y * 17) % 256).toInt
        (r << 16) | (g << 8) | b
      })
    }
    val media = ((1L to 200L).map(id => (id, flatPng(id))) ++
      Seq((1001L, clusterPng(0)), (1002L, clusterPng(5))))
      .toDF("doc_id", "payload")

    // batch path: guard off is quadratic in the flat bucket; auto cap
    // (202 fp × 7 bands -> cap 76 < 200) drops it with NO caller
    // parameter while the planted pair's 2-strong buckets survive
    val uncapped = Multimodal.imageNearDup(spark, media, maxBandBucket = 0).collect()
    assert(uncapped.length === 200 * 199 / 2 + 1,
      "guard off: all-pairs volume in the flat-image bucket")
    val auto = Multimodal.imageNearDup(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(auto.toSeq === Seq((1001L, 1002L)),
      "auto cap must bound the flat-image corpus with no parameter")

    // incremental (daily-ingest) path: stored = 150 flat + one planted
    // member's hashes, new = 50 flat + the other planted member
    import org.apache.spark.sql.functions.col
    val stored = Multimodal.imageDhash(spark,
      media.filter(col("doc_id") <= 150 || col("doc_id") === 1001L))
    val newMedia = media.filter(col("doc_id") > 150 && col("doc_id") =!= 1001L)
    val incUncapped = Multimodal.imageNearDupIncremental(spark, newMedia, stored,
      maxBandBucket = 0).collect()
    assert(incUncapped.length === 200 * 199 / 2 - 150 * 149 / 2 + 1,
      "guard off: every flat pair with a new side")
    val incAuto = Multimodal.imageNearDupIncremental(spark, newMedia, stored).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3)))
    assert(incAuto.toSeq === Seq((1001L, 1002L, true)),
      "auto cap must bound the daily-ingest path with no parameter; " +
        "the planted stored-vs-new dup survives as a cross pair")
  }

  test("WAV codec tier: PCM16 round-trips bit-exactly; decode is shuffle-free") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // kernel round-trip: encode→decode returns the exact samples + rate
    val samples = Array.tabulate(300)(i => (((7L * 31 + i * 17) % 2003) - 1001).toShort)
    val (rate, back) = Multimodal.WavCodec.decode(
      Multimodal.WavCodec.encode(16000f, samples))
    assert(rate === 16000f && back.toSeq === samples.toSeq,
      "16-bit PCM must survive the WAV container bit-exactly")
    // table tier: decoded aggregates equal the closed form of the fixture
    val feats = Multimodal.decodeWavFeatures(spark,
      Multimodal.syntheticWavTable(spark, docs))
    val rows = feats.collect().map(r => r.getLong(0) ->
      (r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4), r.getInt(5), r.getLong(6))).toMap
    assert(rows.size === docs.count())
    rows.foreach { case (id, (sr, n, sum, mn, mx, sumAbs)) =>
      val amps = (0L until (200 + id % 100)).map(i => ((id * 31 + i * 17) % 2003) - 1001)
      assert(sr === (8000 + (id % 4) * 4000).toInt && n === amps.length.toLong)
      assert(sum === amps.sum && mn === amps.min && mx === amps.max)
      assert(sumAbs === amps.map(math.abs).sum)
    }
    // narrow end to end: encode and decode stages never shuffle
    val plan = feats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected shuffle-free plan, got:\n$plan")
  }

  test("audioNearDup: exactly the planted clusters; hashing shuffle-free; hamming <= 1") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticWavClusters(spark, docs)
    // hashing is a narrow stage — audio bytes never cross a shuffle
    val hashPlan = Multimodal.audioEhash(spark, media)
      .queryExecution.executedPlan.toString
    assert(!hashPlan.contains("Exchange"), s"hashing must not shuffle:\n$hashPlan")
    val pairs = Multimodal.audioNearDup(spark, media)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    pairs.unpersist(false)
    val n = docs.count()
    // every same-residue pair is a planted perceptual dup (the first-
    // sample bump can flip only the e(1) > e(0) bit); distinct
    // clusters' energy profiles sit far apart
    val expected = (for {
      a <- 0L until n; b <- (a + 1) until n
      if a % 50 == b % 50
    } yield (a, b)).toSet
    assert(got.map(p => (p._1, p._2)).toSet === expected)
    assert(got.forall(_._3 <= 1), "in-cluster Hamming is at most the bump bit")
  }

  test("audioNearDupIncremental: only pairs with a new side; agrees with the full run") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticWavClusters(spark, docs)
    val stored = Multimodal.audioEhash(spark, media.filter(col("doc_id") < 250))
    val inc = Multimodal.audioNearDupIncremental(spark,
      media.filter(col("doc_id") >= 250), stored).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), (r.getInt(2), r.getBoolean(3)))).toMap
    assert(inc.nonEmpty)
    inc.foreach { case ((a, b), (_, cross)) =>
      assert(a >= 250 || b >= 250)
      assert(cross === ((a < 250) != (b < 250)))
    }
    val full = Multimodal.audioNearDup(spark, media).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    val expected = full.filter { case ((a, b), _) => a >= 250 || b >= 250 }
    assert(inc.keySet === expected.keySet)
    inc.foreach { case (k, (hamming, _)) => assert(hamming === expected(k)) }
    Multimodal.audioNearDup(spark, media).unpersist(false)
  }

  test("imageQualityStats: flat detector fires exactly on the planted flat images; narrow") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticPngSkewed(spark, docs)
    val stats = Multimodal.imageQualityStats(spark, media)
    val rows = stats.collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getBoolean(9) === (id % 4 == 0), s"doc $id is_flat")
      assert((r.getInt(8) == 1) === r.getBoolean(9), "is_flat <=> one distinct luma")
      assert(r.getLong(4) <= r.getLong(5), "min <= max")
      // exact-integer identity: n*sumSq >= sum^2 (Cauchy-Schwarz, and
      // equality exactly on flat images)
      val n = r.getLong(3); val sum = r.getLong(6); val sumSq = r.getLong(7)
      assert(n * sumSq >= sum * sum)
      assert((n * sumSq == sum * sum) === r.getBoolean(9))
    }
    val plan = stats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quality scan must not shuffle:\n$plan")
  }

  test("imageStatsDhash: fused one-decode stage equals quality-stats join dhash; narrow") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticPngSkewed(spark, docs)
    val fused = Multimodal.imageStatsDhash(spark, media)
    // column-for-column identical to the two standalone operators run
    // separately (which pay two decodes) — the fusion changes cost only
    val expected = Multimodal.imageQualityStats(spark, media)
      .join(Multimodal.imageDhash(spark, media), "doc_id")
    assert(fused.columns.toSeq ===
      expected.select(fused.columns.map(org.apache.spark.sql.functions.col): _*)
        .columns.toSeq)
    assert(fused.collect().map(_.toSeq).toSet ===
      expected.select(fused.columns.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).toSet)
    // flat images (constant luma) hash to 0 — the degenerate mass the
    // band-bucket cap guards against, visible from the fused row alone
    fused.collect().foreach { r =>
      if (r.getBoolean(9)) assert(r.getLong(10) === 0L, s"flat doc ${r.getLong(0)}")
    }
    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fused scan must not shuffle:\n$plan")
  }

  test("audioStatsEhash: fused one-decode stage equals quality-stats join ehash; narrow") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticWavSkewed(spark, docs)
    val fused = Multimodal.audioStatsEhash(spark, media)
    val expected = Multimodal.audioQualityStats(spark, media)
      .join(Multimodal.audioEhash(spark, media), "doc_id")
    assert(fused.collect().map(_.toSeq).toSet ===
      expected.select(fused.columns.map(org.apache.spark.sql.functions.col): _*)
        .collect().map(_.toSeq).toSet)
    // silent clips (all-zero PCM): every window energy 0 => eHash 0 and
    // quiet — the degenerate mass the banding cap guards against
    fused.collect().foreach { r =>
      if (r.getLong(0) % 4 == 0) {
        assert(r.getBoolean(8), s"doc ${r.getLong(0)} quiet")
        assert(r.getLong(9) === 0L, s"doc ${r.getLong(0)} ehash")
      }
    }
    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fused scan must not shuffle:\n$plan")
  }

  test("videoStatsPhash: fused full-decode stage equals quality join phash sig; zero-frame safe") {
    import org.apache.spark.sql.functions.{col, expr}
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticVideoJunk(spark, docs)
    val fused = Multimodal.videoStatsPhash(spark, media)
    val qual = Multimodal.videoQualityStats(spark, media)
    assert(fused.drop("sig").collect().map(_.toSeq).toSet ===
      qual.select(fused.drop("sig").columns.map(col): _*)
        .collect().map(_.toSeq).toSet)
    // the sig array IS videoPhash's slot hashes, read off the same decode
    val slots = fused.select(col("doc_id"),
        org.apache.spark.sql.functions.posexplode(col("sig")))
      .toDF("doc_id", "slot", "dhash")
    val phash = Multimodal.videoPhash(spark, media)
      .select("doc_id", "slot", "dhash")
    assert(slots.collect().map(_.toSeq).toSet === phash.collect().map(_.toSeq).toSet)
    // zero-frame container => empty sig, no slot rows (mirrors videoPhash)
    import spark.implicits._
    val empty = Seq((999L, Multimodal.VideoCodec.encode(12, Seq.empty)))
      .toDF("doc_id", "payload")
    val er = Multimodal.videoStatsPhash(spark, empty)
      .filter(expr("size(sig) = 0")).count()
    assert(er === 1L)
    val plan = fused.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"fused scan must not shuffle:\n$plan")
  }

  test("cluster cores recover identical-content clusters even under the auto cap") {
    import spark.implicits._
    // 60 copies of ONE image: the banded join's zero-bucket would blow
    // past the auto cap (and used to silently drop the cluster), but
    // identical fingerprints now collapse to star edges BEFORE banding,
    // so the cluster survives with the cap ON — linear in copies
    val flat = Multimodal.PngCodec.encode(12, 12, (_, _) => 0x606060)
    val media = (1L to 60L).map(id => (id, flat)).toDF("doc_id", "payload")
    val clusters = Multimodal.imageClusters(spark, media).collect()
    assert(clusters.length === 60, "every copy belongs to the cluster")
    assert(clusters.forall(_.getAs[Long]("cluster_id") == 1L), "min-id label")
    assert(clusters.forall(_.getAs[Long]("cluster_size") == 60L))
    // audio twin: 60 silent clips share eHash 0
    val wav = Multimodal.WavCodec.encode(8000f, new Array[Short](256))
    val amedia = (1L to 60L).map(id => (id, wav)).toDF("doc_id", "payload")
    val ac = Multimodal.audioClusters(spark, amedia).collect()
    assert(ac.length === 60 && ac.forall(_.getAs[Long]("cluster_id") == 1L))
    // video twin: 60 copies of one flat clip share the zero signature
    val frame = Multimodal.PngCodec.encode(8, 8, (_, _) => 0x303030)
    val gvid = Multimodal.VideoCodec.encode(12, Seq(frame, frame, frame, frame))
    val vmedia = (1L to 60L).map(id => (id, gvid)).toDF("doc_id", "payload")
    val vc = Multimodal.videoClusters(spark, vmedia).collect()
    assert(vc.length === 60 && vc.forall(_.getAs[Long]("cluster_id") == 1L))
  }

  test("imageClusterRepresentatives keeps the RICHEST member, not the min id") {
    import spark.implicits._
    // doc 1: constant color (1 distinct luma). doc 2: same color at
    // every dHash GRID sample (so hamming 0 => same cluster) but with
    // off-grid pixels varied => 4 distinct lumas. The keep-decision
    // must pick doc 2 — a min-id-biased ranking would pick doc 1.
    val flat = Multimodal.PngCodec.encode(16, 16, (_, _) => 0x505050)
    val rich = Multimodal.PngCodec.encode(16, 16, (x, y) =>
      if (y == 0 && x == 1) 0x505151
      else if (y == 0 && x == 3) 0x515050
      else if (y == 0 && x == 6) 0x505052
      else 0x505050)
    val media = Seq((1L, flat), (2L, rich)).toDF("doc_id", "payload")
    // preconditions: identical dhash, different richness
    val st = Multimodal.imageStatsDhash(spark, media).collect()
      .map(r => r.getLong(0) -> (r.getLong(10), r.getInt(8))).toMap
    assert(st(1L)._1 === st(2L)._1, "same fingerprint (off-grid pixels only)")
    assert(st(2L)._2 > st(1L)._2, "doc 2 is richer")
    val reps = Multimodal.imageClusterRepresentatives(spark, media).collect()
    assert(reps.length === 1)
    val r = reps(0)
    assert(r.getAs[Long]("cluster_id") === 1L, "cluster labeled by min id")
    assert(r.getAs[Long]("rep_doc") === 2L, "but the RICHEST member is kept")
    assert(r.getAs[Int]("rep_distinct_luma") === st(2L)._2)
    assert(r.getAs[Long]("dropped_pixels") === 256L, "doc 1's pixels dropped")
  }

  test("audio/video cluster representatives keep the richest member") {
    import spark.implicits._
    // audio: two near-dup clips (first-sample bump => eHash hamming <= 1)
    // where the HIGHER-id copy carries more |amplitude| energy — it wins
    def wavOf(bump: Int): Array[Byte] = {
      val samples = Array.tabulate(210) { i =>
        val base = ((31L + i.toLong * 17) % 2003) - 1001
        (if (i == 0) base + bump else base).toShort
      }
      Multimodal.WavCodec.encode(8000f, samples)
    }
    // amp0 = (31%2003)-1001 = -970: a positive bump REDUCES |amp0|, so
    // doc 1 (bump 0) is the energy-richest and doc 2 must NOT win —
    // then swap roles with a fixture where doc 2 is richer
    val a1 = Seq((1L, wavOf(0)), (2L, wavOf(5))).toDF("doc_id", "payload")
    val r1 = Multimodal.audioClusterRepresentatives(spark, a1).collect()(0)
    assert(r1.getAs[Long]("rep_doc") === 1L, "doc 1 has more energy")
    val a2 = Seq((1L, wavOf(5)), (2L, wavOf(0))).toDF("doc_id", "payload")
    val r2 = Multimodal.audioClusterRepresentatives(spark, a2).collect()(0)
    assert(r2.getAs[Long]("rep_doc") === 2L,
      "the richer HIGHER-id copy wins — not min id")
    // video: same slot hashes (cluster), but doc 2 varies an OFF-SLOT
    // frame => more distinct frame hashes => doc 2 is kept
    val frameA = Multimodal.PngCodec.encode(8, 8, (x, y) => (x * 37 + y * 59) % 256)
    val frameB = Multimodal.PngCodec.encode(8, 8, (x, y) => (x * 23 + y * 41) % 256)
    // n=8, k=4 => slots sample frames 0,2,4,6; frames 1,3,5,7 are free
    val vidA = Multimodal.VideoCodec.encode(12, Vector.fill(8)(frameA))
    val vidB = Multimodal.VideoCodec.encode(12,
      Vector(frameA, frameB, frameA, frameA, frameA, frameA, frameA, frameA))
    val vm = Seq((1L, vidA), (2L, vidB)).toDF("doc_id", "payload")
    val vr = Multimodal.videoClusterRepresentatives(spark, vm).collect()
    assert(vr.length === 1)
    assert(vr(0).getAs[Long]("cluster_id") === 1L)
    assert(vr(0).getAs[Long]("rep_doc") === 2L,
      "two distinct frame hashes beat one — richness, not min id")
    assert(vr(0).getAs[Long]("dropped_frames") === 8L)
  }

  test("audioQualityStats: counts match a plain-Scala replay of the decoded samples") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticWavClusters(spark, docs)
    val rows = Multimodal.audioQualityStats(spark, media).collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      val id = r.getLong(0)
      val key = id % 50; val bump = id / 50
      val n = (200 + key % 100).toInt
      val amps = (0 until n).map { i =>
        ((key * 31 + i.toLong * 17) % 2003 - 1001 +
          (if (i == 0) bump else 0L)).toInt
      }
      assert(r.getLong(1) === n.toLong, s"doc $id n_samples")
      assert(r.getInt(2) === amps.min && r.getInt(3) === amps.max, s"doc $id extremes")
      assert(r.getLong(4) === amps.map(a => math.abs(a).toLong).sum, s"doc $id sum_abs")
      val clipped = amps.count(a => math.abs(a) >= 1000).toLong
      val silent = amps.count(a => math.abs(a) <= 50).toLong
      assert(r.getLong(5) === clipped && r.getLong(6) === silent, s"doc $id counts")
      assert(r.getBoolean(7) === (clipped > 0) &&
        r.getBoolean(8) === (silent * 2 >= n), s"doc $id flags")
    }
    // the bed is informative: both flag values occur for is_clipped
    assert(rows.exists(_.getBoolean(7)) && rows.exists(!_.getBoolean(7)))
  }

  test("audioClusters: every planted cluster recovered with min-id label") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticWavClusters(spark, docs)
    val rows = Multimodal.audioClusters(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = docs.count()
    assert(rows.length === n)
    rows.foreach { case (id, cluster, size) =>
      assert(cluster === id % 50, s"doc $id label")
      assert(size === n / 50, s"doc $id size")
    }
  }

  test("videoQualityStats: static/flat flags fire exactly on junk videos; scene counts exact") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticVideoJunk(spark, docs)
    val stats = Multimodal.videoQualityStats(spark, media)
    val rows = stats.collect()
    assert(rows.length === docs.count())
    rows.foreach { r =>
      val id = r.getLong(0); val n = (6 + id % 7).toInt
      val junk = id % 4 == 0
      assert(r.getInt(1) === n, s"doc $id n_frames")
      assert(r.getInt(2) === 12, s"doc $id fps")
      assert(r.getInt(3) === (if (junk) n else 0), s"doc $id n_flat_frames")
      // non-junk videos: one distinct hash per scene
      val scenes = (n + 2) / 3
      assert(r.getInt(4) === (if (junk) 1 else scenes), s"doc $id n_distinct_hashes")
      assert(r.getBoolean(5) === junk, s"doc $id is_static")
      assert(r.getBoolean(6) === junk, s"doc $id is_flat")
    }
    val plan = stats.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"quality scan must not shuffle:\n$plan")
  }

  test("imageNearDup plan contract: image bytes never cross a shuffle") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticPngClusters(spark, docs)
    val pairs = Multimodal.imageNearDup(spark, media)
    // the frame is persisted (scopeCaches); the cached plan inside
    // InMemoryRelation still prints the full operator pipeline
    val plan = pairs.queryExecution.executedPlan.toString
    // every exchange must partition on derived keys (band/doc_id/dhash)
    // — the payload column is consumed by the narrow decode stage and
    // must never be a shuffle input
    val parts = "hashpartitioning\\(([^)]*)\\)".r
      .findAllMatchIn(plan).map(_.group(1)).toSeq
    assert(parts.nonEmpty, s"expected banded-join shuffles in:\n$plan")
    assert(parts.forall(!_.contains("payload")),
      s"image payload must not be a shuffle key:\n$parts")
    pairs.unpersist(false)
  }

  test("imageClusters: components recover the planted residue classes exactly") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val media = Multimodal.syntheticPngClusters(spark, docs)
    val rows = Multimodal.imageClusters(spark, media).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = docs.count()
    assert(rows.length === n, "every image is in a planted multi-image cluster")
    rows.foreach { case (id, cid, size) =>
      assert(cid === id % 50, s"label must be the min doc_id of the residue class")
      assert(size === n / 50)
    }
  }
}
