package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Materialized sidecar cache for the synthetic media fixtures.
  *
  * The media-tier queries run over synthetic payload tables (real PNG /
  * WAV / GVID bytes generated closed-form from `documents.doc_id`).
  * Generating those payloads means ENCODING the whole corpus — and a
  * benchmark that synthesizes its input inside the timed body measures
  * the fixture encoder, not the engine (at sf0.1 every video query was
  * spending most of its wall time encoding ~30k PNG frames before the
  * operator under test ran). A real deployment reads stored payloads.
  *
  * So each fixture table is written to parquet ONCE per (testdata
  * generation, kind) under the JVM temp dir and every later use — all
  * bench passes, verify, repeated local runs — is a plain parquet scan,
  * which is exactly the I/O shape the 100 TB design point has. The
  * cache key fingerprints the `documents.parquet` file (path, mtime,
  * size), so regenerated testdata invalidates automatically; the
  * generators are deterministic in doc_id, so a cached table is
  * row-identical to fresh generation and every DuckDB oracle stays
  * valid. Writes go to a staging dir then rename, so a killed run
  * can't leave a half-written dir that later runs mistake for a
  * complete fixture.
  */
object MediaFixtures {

  /** fixture kind -> generator (all deterministic in doc_id) */
  private val kinds: Map[String, (SparkSession, String) => DataFrame] = Map(
    "png" -> ((s, d) => ext.Multimodal.syntheticPngTable(s, Tables.documents(s, d))),
    "jpeg" -> ((s, d) => ext.Multimodal.syntheticJpegTable(s, Tables.documents(s, d))),
    "png_clusters" -> ((s, d) => ext.Multimodal.syntheticPngClusters(s, Tables.documents(s, d))),
    "png_skewed" -> ((s, d) => ext.Multimodal.syntheticPngSkewed(s, Tables.documents(s, d))),
    "wav" -> ((s, d) => ext.Multimodal.syntheticWavTable(s, Tables.documents(s, d))),
    "wav_clusters" -> ((s, d) => ext.Multimodal.syntheticWavClusters(s, Tables.documents(s, d))),
    "wav_skewed" -> ((s, d) => ext.Multimodal.syntheticWavSkewed(s, Tables.documents(s, d))),
    "video" -> ((s, d) => ext.Multimodal.syntheticVideoTable(s, Tables.documents(s, d))),
    "video_scenes" -> ((s, d) => ext.Multimodal.syntheticVideoScenes(s, Tables.documents(s, d))),
    "video_junk" -> ((s, d) => ext.Multimodal.syntheticVideoJunk(s, Tables.documents(s, d))),
    "video_clusters" -> ((s, d) => ext.Multimodal.syntheticVideoClusters(s, Tables.documents(s, d))))

  /** media-fixture kinds each driver query reads — so a bench run can
    * pre-materialize (untimed) exactly what its query set needs
    */
  val queryKinds: Map[String, Seq[String]] = Map(
    "q_png_decode" -> Seq("png"),
    "q_jpeg_decode" -> Seq("jpeg"),
    "q_wav_decode" -> Seq("wav"),
    "q_audio_ehash" -> Seq("wav_clusters"),
    "q_audio_neardup" -> Seq("wav_clusters"),
    "q_audio_clusters" -> Seq("wav_clusters"),
    "q_audio_neardup_inc" -> Seq("wav_clusters"),
    "q_audio_quality" -> Seq("wav_clusters"),
    "q_image_dhash" -> Seq("png_clusters"),
    "q_image_neardup" -> Seq("png_clusters"),
    "q_image_clusters" -> Seq("png_clusters"),
    "q_image_neardup_inc" -> Seq("png_clusters"),
    "q_image_quality" -> Seq("png_skewed"),
    "q_image_stats_dhash" -> Seq("png_skewed"),
    "q_video_decode" -> Seq("video"),
    "q_video_frames" -> Seq("video"),
    "q_video_phash" -> Seq("video"),
    "q_video_scenes" -> Seq("video_scenes"),
    "q_video_quality" -> Seq("video_junk"),
    "q_video_neardup" -> Seq("video_clusters"),
    "q_video_clusters" -> Seq("video_clusters"),
    "q_video_neardup_inc" -> Seq("video_clusters"),
    "q_crossmodal_dedup" -> Seq("png_clusters"),
    "q_multimodal_funnel" -> Seq("png_skewed"),
    "q_curation_report" -> Seq("png_skewed"),
    "q_audio_stats_ehash" -> Seq("wav_skewed"),
    "q_video_stats_phash" -> Seq("video_junk"),
    "q_media_curation_report" -> Seq("png_skewed", "wav_skewed", "video_junk"),
    "q_media_ingest_audit" -> Seq("png_skewed", "wav_skewed", "video_junk"),
    "q_image_cluster_reps" -> Seq("png_skewed"),
    "q_audio_cluster_reps" -> Seq("wav_skewed"),
    "q_video_cluster_reps" -> Seq("video_clusters"))

  /** Fingerprint of the current testdata generation: a cached fixture
    * is valid only for the documents file it was derived from.
    */
  private def generationKey(sfDir: String): String = {
    def sig(f: java.io.File): String =
      if (f.isDirectory) {
        val kids = Option(f.listFiles()).getOrElse(Array.empty)
        s"${kids.length}:${kids.map(_.lastModified).foldLeft(0L)(math.max)}:${kids.map(_.length).sum}"
      } else s"1:${f.lastModified}:${f.length}"
    val doc = new java.io.File(sfDir, "documents.parquet")
    val raw = s"$sfDir|${sig(doc)}"
    val md = java.security.MessageDigest.getInstance("MD5")
    md.digest(raw.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
  }

  private def cacheDir(sfDir: String, kind: String): java.io.File =
    new java.io.File(new java.io.File(
      sys.props("java.io.tmpdir"), "graft_media_fixtures"),
      s"${generationKey(sfDir)}/$kind")

  /** The fixture table for `kind` over `sfDir`'s documents —
    * materialized to parquet on first use, a plain scan afterwards.
    */
  def table(spark: SparkSession, sfDir: String, kind: String): DataFrame = {
    val target = cacheDir(sfDir, kind)
    if (!new java.io.File(target, "_SUCCESS").exists()) synchronized {
      if (!new java.io.File(target, "_SUCCESS").exists()) {
        val staging = new java.io.File(target.getParentFile,
          s".${target.getName}.staging-${spark.sparkContext.applicationId}")
        kinds(kind)(spark, sfDir).write.mode("overwrite").parquet(staging.toString)
        target.getParentFile.mkdirs()
        if (!staging.renameTo(target)) {
          // a concurrent run won the rename — use its table
          if (!new java.io.File(target, "_SUCCESS").exists())
            throw new java.io.IOException(s"fixture rename failed: $staging -> $target")
          def rm(x: java.io.File): Unit = {
            Option(x.listFiles()).foreach(_.foreach(rm)); x.delete(): Unit
          }
          rm(staging)
        }
      }
    }
    spark.read.parquet(target.toString)
  }

  /** Pre-materialize (untimed) every fixture the given queries read. */
  def ensureFor(spark: SparkSession, sfDir: String, queryNames: Seq[String]): Unit =
    queryNames.flatMap(queryKinds.getOrElse(_, Nil)).distinct
      .foreach(k => table(spark, sfDir, k).count(): Unit)
}
