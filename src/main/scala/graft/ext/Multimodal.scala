package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.10): opaque `binary` payload
  * columns carried with typed metadata structs, plus a batch
  * decode/feature-extract stage.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic fake ([[FakeCodec]]); everything around
  * it — schema (binary + struct metadata), partition-preserving batch
  * shape (`mapPartitions`), and the feature projection — is real and
  * tested. Swap [[FakeCodec.decode]] for a real codec binding on a
  * cluster with the native libs installed.
  */
object Multimodal {

  /** Typed metadata carried beside the opaque payload. */
  case class MediaMeta(mediaType: String, widthPx: Int, heightPx: Int, sourceId: Long)

  case class MediaRecord(docId: Long, payload: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(docId: Long, mediaType: String, nBytes: Int,
                           meanByte: Double, featureHash: Long)

  /** Deterministic fake codec — STUB for the real image/audio decode.
    * Produces stable pseudo-features from the payload bytes so the
    * Spark-side plumbing (batching, schema, shuffle boundaries) is fully
    * exercisable without native codec libraries (none ship in this
    * container). A real deployment swaps these bodies for codec
    * bindings; signatures and batch shapes stay as-is.
    */
  object FakeCodec {
    def decode(payload: Array[Byte]): Array[Double] = {
      // real impl would be e.g. JPEG decode → pixel tensor; here: byte stats
      if (payload.isEmpty) Array(0.0)
      else payload.map(b => (b & 0xFF).toDouble)
    }

    /** STUB resize: nearest-neighbor downsample of the decoded "pixels"
      * to `target` samples (a real impl resamples a H×W×C tensor).
      */
    def resize(decoded: Array[Double], target: Int): Array[Double] = {
      if (decoded.length <= target) decoded
      else Array.tabulate(target)(i => decoded((i.toLong * decoded.length / target).toInt))
    }

    /** STUB frame sampling: split the payload into `n` equal-size frames
      * (a real impl seeks keyframes in a video container).
      */
    def frameSample(payload: Array[Byte], n: Int): Seq[Array[Byte]] = {
      if (payload.isEmpty || n <= 0) Seq.empty
      else {
        val size = math.max(1, payload.length / n)
        payload.grouped(size).take(n).toSeq
      }
    }
  }

  /** Build a multimodal table from `documents`: the UTF-8 bytes of the
    * text stand in for an opaque media payload, with a metadata struct
    * derived deterministically. This is the ingest shape: payload stays
    * binary end-to-end, metadata is a first-class nested struct.
    */
  def toMediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("media_type"),
        (col("n_chars") % 640).cast("int").as("width_px"),
        (col("n_chars") % 480).cast("int").as("height_px"),
        col("doc_id").as("source_id")).as("meta"))

  /** Batch feature extraction over the media table via `mapPartitions` —
    * the per-partition batch shape a real codec needs (amortize codec
    * init per partition, not per row). No shuffle: narrow transformation.
    */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"), col("meta.media_type"))
      .as[(Long, Array[Byte], String)]
      .mapPartitions { it =>
        // per-partition init site (real codec: open decoder context here)
        it.map { case (id, payload, mt) =>
          val decoded = Multimodal.FakeCodec.decode(payload)
          val mean = decoded.sum / decoded.length
          val fh = decoded.foldLeft(17L)((a, v) => a * 1000003L + java.lang.Double.doubleToLongBits(v))
          MediaFeatures(id, mt, payload.length, mean, fh)
        }
      }
  }

  /** Resize + frame-sample stage over the media table: per-partition
    * batch shape again (`mapPartitions`); emits one row per sampled
    * frame with the resized feature vector — the explode-shaped output a
    * video/image pipeline feeds to embedding models.
    */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   nFrames: Int = 4, resizeTo: Int = 16): DataFrame = {
    import spark.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          FakeCodec.frameSample(payload, nFrames).zipWithIndex.map {
            case (frame, idx) =>
              (id, idx, frame.length, FakeCodec.resize(FakeCodec.decode(frame), resizeTo))
          }
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes", "features")
  }

  /** Aspect-ratio bucketing + batch packing — the image/video-training
    * batching trick: group media by aspect-ratio class (so a batch's
    * tensors share a shape and need no padding), then pack each bucket
    * into fixed-size training batches in deterministic doc order.
    * The bucket is an INTEGER aspect decile (`width*10 div height`) —
    * exact on any engine, no float rounding at bucket edges; zero
    * heights land in a NULL bucket instead of dividing by zero. One
    * shuffle on the bucket key; batch ids come from a per-bucket
    * row_number, the same running-total shape as sequence packing.
    */
  def aspectBatches(media: DataFrame, batchSize: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucket = when(col("meta.height_px") > 0,
      expr("CAST(meta.width_px AS BIGINT) * 10 div meta.height_px"))
    val w = Window.partitionBy(col("aspect_bucket")).orderBy(col("doc_id"))
    media.withColumn("aspect_bucket", bucket)
      .withColumn("rn", row_number().over(w).cast("long") - 1)
      .withColumn("batch_id", expr(s"rn div $batchSize"))
      .groupBy("aspect_bucket", "batch_id").agg(
        count(lit(1)).as("n_items"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
      .orderBy(col("aspect_bucket").asc_nulls_first, col("batch_id"))
  }

  /** Oracle-matched projection of the binary plumbing: payload byte
    * length + SHA-256 content hash, both engine-portable (DuckDB:
    * octet_length / sha256 over the same UTF-8 bytes).
    */
  def binaryStats(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id"),
      octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
      sha2(encode(col("text"), "UTF-8"), 256).as("sha256_hex"))
      .orderBy("doc_id")
}
