package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Steady-state evidence for the OPERATIONAL ingest loops at stress
  * scale — the measurement the live loops were built for (the toy-scale
  * specs pin correctness; this pins the day-N cost curve):
  *
  *   A. LIVE stream: [[graft.streaming.StreamingOps.mediaIngestStream]]
  *      driven over N micro-batch days at ×factor via MemoryStream —
  *      each addData + processAllAvailable is one "day" (one
  *      foreachBatch). Records per-day wall and the store bytes the
  *      day's audit reads (`day < N` pruning means the whole
  *      accumulated store). The claim under test: day-N wall stays
  *      FLAT as the store grows, because the stored side is hashes
  *      only and the banded join is NEW×ALL.
  *
  *   C. IVF-index ingest loop: [[graft.streaming.StreamingOps
  *      .ivfIndexIngestStream]] driven over N micro-batch days against
  *      a day-0-seeded persisted index. Records per-day wall (claim: a
  *      day is O(batch × nList) against FIXED centroids — it reads NO
  *      store at all, so day-N wall is flat in the indexed-store size)
  *      and the store probe's latency after each day (claim: probe
  *      cost grows only with the probed lists' member count —
  *      corpus/nList × nProbe — not with day count; day files are
  *      partition-pruned like batch lists). A closing
  *      [[graft.ext.Similarity.ivfIndexStoreReseed]] folds the day
  *      partitions and re-prices the probe over the consolidated
  *      balanced lists.
  *
  *   B. Compaction-cadence A/B on the batch fold loop (the SAME day
  *      arithmetic — stream-day ≡ chained-fold is spec-pinned in
  *      StreamingOpsSpec, so the A/B transfers): two dirs seeded with
  *      IDENTICAL redundant raw stores (every fingerprint ×10 under
  *      distinct doc_ids — the shape an append-only history
  *      accumulates; StressBench's redundant-store synth), then N days
  *      of [[graft.ext.Curation.ingestDayFold]] each. Variant `never`
  *      never compacts; variant `every3` runs
  *      [[graft.ext.Curation.ingestStoreCompact]] after days 3/6/9
  *      (timed separately). Records per-day wall and store bytes
  *      scanned — the audit collapses stored fingerprints by contract,
  *      so the per-day delta is the pure scan+collapse cost redundancy
  *      adds and the compaction payoff is (bytes, wall) per day after
  *      each compaction.
  *
  * Usage: StreamStress [sfDir] [factor] [days]
  * Single-sample rows: keep the host quiet. Writes the full record to
  * STREAM_STRESS.json (override: SPARK_GRAFT_STREAM_JSON).
  */
object StreamStress {

  private def dirBytes(p: String): Long = {
    def s(f: java.io.File): Long =
      if (f.isDirectory) Option(f.listFiles()).map(_.map(s).sum).getOrElse(0L)
      else f.length()
    s(new java.io.File(p))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val nDays = if (args.length > 2) args(2).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup
    import spark.implicits._

    // ×factor corpora on parquet sidecars, pre-materialized + page-warmed
    // UNTIMED (the fixture-encode-outside-timed-body rule)
    def fixture(kind: String): DataFrame =
      MediaFixtures.tableReplicated(spark, sfDir, kind, factor)
    Seq("png_skewed", "wav_skewed", "video_junk").foreach { k =>
      fixture(k).selectExpr("sum(length(payload))").collect(); ()
    }
    // codec JIT warm-up (same rationale as Bench)
    ext.Multimodal.imageDhash(spark, fixture("png_skewed").limit(64)).count()
    ext.Multimodal.audioEhash(spark, fixture("wav_skewed").limit(64)).count()
    ext.Multimodal.videoPhash(spark, fixture("video_junk").limit(64)).count()

    def daySlice(kind: String, d: Int): DataFrame =
      fixture(kind).filter(col("doc_id") % nDays === d)

    val root = java.nio.file.Files.createTempDirectory("graft_stream_stress").toString
    val sb = new StringBuilder

    // ---- A: live stream, N micro-batch days, no compaction ----
    locally {
      val (storeDir, auditDir) = (s"$root/live/store", s"$root/live/audit")
      implicit val sc = spark.sqlContext
      val input = MemoryStream[(Long, Array[Byte], Array[Byte], Array[Byte])]
      val media = input.toDF().toDF("doc_id", "image", "audio", "video")
      val q = graft.streaming.StreamingOps.mediaIngestStream(
        media, storeDir, auditDir, s"$root/live/ckpt")
      val rows = try {
        (0 until nDays).map { d =>
          // driver-side feed is setup (MemoryStream holds batch data on
          // the driver by design); only processAllAvailable — the
          // micro-batch execution — is timed
          def pay(kind: String): Map[Long, Array[Byte]] =
            daySlice(kind, d).select("doc_id", "payload").collect()
              .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
          val (im, au, vi) = (pay("png_skewed"), pay("wav_skewed"), pay("video_junk"))
          val batch = im.keySet.toSeq.sorted.map(id => (id, im(id), au(id), vi(id)))
          val bytesBefore = dirBytes(storeDir)
          input.addData(batch)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val wall = (System.nanoTime() - t0) / 1e9
          System.err.println(f"[stream] day $d: $wall%.2fs, store $bytesBefore b")
          s"""{"day":$d,"wall":$wall,"store_bytes_before":$bytesBefore,"batch_docs":${batch.size}}"""
        }
      } finally q.stop()
      sb.append(s""""live_stream":[${rows.mkString(",")}]""")
    }

    // ---- C: IVF index ingest loop — flat day cost, probe vs day count ----
    locally {
      val indexDir = s"$root/ivf/index"
      // ×factor corpus materialized to parquet UNTIMED (replicate()'s
      // explode lineage would otherwise re-run inside every timed body)
      val corpusPq = {
        val p = s"$root/ivf/corpus"
        StressBench.replicate(Tables.embeddings(spark, sfDir), factor, Seq("vec_id"))
          .write.mode("overwrite").parquet(p)
        spark.read.parquet(p)
      }
      def embDay(d: Int): DataFrame =
        corpusPq.filter(col("vec_id") % (nDays + 1) === d)
      val queries = corpusPq.filter(col("vec_id") < 10)
      // day 0 seeds + initial lists; days 1..N stream in
      ext.Similarity.ivfIndexStoreInit(embDay(0), indexDir)
      implicit val sc = spark.sqlContext
      val input = MemoryStream[(Long, Array[Float])]
      val q = graft.streaming.StreamingOps.ivfIndexIngestStream(
        input.toDF().toDF("vec_id", "embedding"), indexDir, s"$root/ivf/ckpt")
      val rows = try {
        (1 to nDays).map { d =>
          val batch = embDay(d).select("vec_id", "embedding").collect()
            .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
          val bytesBefore = dirBytes(indexDir)
          input.addData(batch.toSeq)
          val t0 = System.nanoTime()
          q.processAllAvailable()
          val wall = (System.nanoTime() - t0) / 1e9
          val p0 = System.nanoTime()
          val nProbe = ext.Similarity.ivfIndexStoreProbe(
            spark, queries, indexDir).count()
          val probeWall = (System.nanoTime() - p0) / 1e9
          System.err.println(f"[ivf] day $d: ingest $wall%.2fs, " +
            f"probe $probeWall%.2fs ($nProbe rows), index $bytesBefore b")
          s"""{"day":$d,"wall":$wall,"probe_wall":$probeWall,""" +
            s""""index_bytes_before":$bytesBefore,"batch_vecs":${batch.length}}"""
        }
      } finally q.stop()
      val r0 = System.nanoTime()
      val occ = ext.Similarity.ivfIndexStoreReseed(spark, indexDir)
      val maxList = occ.agg(max(col("list_size"))).collect()(0).getLong(0)
      val reseedWall = (System.nanoTime() - r0) / 1e9
      val p0 = System.nanoTime()
      ext.Similarity.ivfIndexStoreProbe(spark, queries, indexDir).count()
      val probeAfter = (System.nanoTime() - p0) / 1e9
      System.err.println(f"[ivf] reseed $reseedWall%.2fs, " +
        f"probe after $probeAfter%.2fs, max list $maxList")
      sb.append(s""","ivf_stream":[${rows.mkString(",")}]""")
      sb.append(s""","ivf_reseed":{"wall":$reseedWall,""" +
        s""""probe_wall_after":$probeAfter,"max_list":$maxList}""")
    }

    // ---- B: batch-fold compaction A/B over identical redundant seeds ----
    // redundant raw store: every fingerprint ×10 under distinct doc_ids
    // (StressBench.redundantStore's synth — base ids disjoint from the
    // corpus, spread hashes so only EXACT redundancy is planted)
    def seedStore(dir: String): Unit = {
      val mask = Long.MaxValue
      val n = 5000L * factor / 10
      val fan = spark.range(n).select((col("id") + 1000000000L).as("base"))
        .withColumn("c", explode(sequence(lit(0), lit(9))))
        .select((col("base") + col("c") * 10000000L).as("doc_id"), col("base"))
      ext.Curation.ingestStoreInit(spark, dir,
        fan.select(col("doc_id"),
          xxhash64(col("base")).bitwiseAND(lit(mask)).as("dhash")),
        fan.select(col("doc_id"),
          xxhash64(col("base"), lit("a")).bitwiseAND(lit(mask)).as("ehash")),
        fan.select(col("doc_id"), col("base"),
            explode(sequence(lit(0), lit(3))).as("slot"))
          .select(col("doc_id"), col("slot"),
            xxhash64(col("base"), col("slot")).bitwiseAND(lit(mask)).as("dhash")))
    }
    def runVariant(name: String, compactEvery: Int): (String, String) = {
      val dir = s"$root/fold_$name"
      seedStore(dir)
      val days = scala.collection.mutable.ArrayBuffer[String]()
      val compactions = scala.collection.mutable.ArrayBuffer[String]()
      (0 until nDays).foreach { d =>
        val bytesBefore = dirBytes(dir)
        val t0 = System.nanoTime()
        val a = ext.Curation.ingestDayFold(spark,
          daySlice("png_skewed", d), daySlice("wav_skewed", d),
          daySlice("video_junk", d), dir)
        a.count()
        val wall = (System.nanoTime() - t0) / 1e9
        a.unpersist(false)
        System.err.println(f"[fold:$name] day $d: $wall%.2fs, store $bytesBefore b")
        days += s"""{"day":$d,"wall":$wall,"store_bytes_before":$bytesBefore}"""
        if (compactEvery > 0 && (d + 1) % compactEvery == 0 && d + 1 < nDays) {
          val c0 = System.nanoTime()
          val counts = ext.Curation.ingestStoreCompact(spark, dir)
          val cw = (System.nanoTime() - c0) / 1e9
          val cc = counts.map { case (m, (b, aft)) =>
            s""""$m":{"before":$b,"after":$aft}""" }.mkString(",")
          System.err.println(f"[fold:$name] compact after day $d: $cw%.2fs $counts")
          compactions += s"""{"after_day":$d,"wall":$cw,$cc}"""
        }
      }
      (s"""[${days.mkString(",")}]""", s"""[${compactions.mkString(",")}]""")
    }
    val (neverDays, _) = runVariant("never", 0)
    val (every3Days, every3Compactions) = runVariant("every3", 3)
    sb.append(s""","fold_never":$neverDays""")
    sb.append(s""","fold_every3":$every3Days""")
    sb.append(s""","fold_every3_compactions":$every3Compactions""")

    val json = s"""{"metric":"stream_stress","factor":$factor,"days":$nDays,$sb,"sf":"$sfDir"}"""
    val path = sys.env.getOrElse("SPARK_GRAFT_STREAM_JSON", "STREAM_STRESS.json")
    val w = new java.io.PrintWriter(path, "UTF-8")
    try w.println(json) finally w.close()
    println(json.take(1800))
    spark.stop()
  }
}
