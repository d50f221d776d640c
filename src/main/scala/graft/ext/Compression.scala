package graft.ext

import java.util.zip.Deflater

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Compression-ratio quality signal (SURVEY §2.10 text analysis): the
  * zlib-deflate ratio of each document's UTF-8 bytes — the standard
  * cheap redundancy detector in web-corpus pipelines (highly repetitive
  * or templated text compresses far below prose; near-random text
  * doesn't compress at all). Pure JVM (`java.util.zip.Deflater`), no
  * native deps.
  *
  * Shape: one `mapPartitions` stage, narrow (no shuffle — plan-tested),
  * with a single Deflater instance per partition reset between
  * documents — codec init is amortized exactly like the multimodal
  * batch stages ([[Multimodal.extractFeatures]]). Deflate output for a
  * fixed input and level is deterministic, so the query is
  * row-deterministic; it is NOT SQL-expressible in the oracle engine
  * (no zlib there), hence a rows-only driver check plus determinism and
  * ordering properties pinned in CompressionSpec.
  */
object Compression {

  /** Deflate `bytes` at `level`, returning the compressed byte count
    * (the payload itself is discarded — the signal is the size).
    */
  private[ext] def deflatedSize(d: Deflater, bytes: Array[Byte]): Int = {
    d.reset()
    d.setInput(bytes)
    d.finish()
    val chunk = new Array[Byte](8192)
    var total = 0
    while (!d.finished()) total += d.deflate(chunk)
    total
  }

  /** Per-document compression signal: raw UTF-8 size, deflated size,
    * and the ratio (deflated/raw, lower = more redundant). Empty text
    * reports ratio NULL rather than a division artifact.
    */
  def compressionSignal(spark: SparkSession, documents: DataFrame,
                        level: Int = Deflater.DEFAULT_COMPRESSION): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = new Deflater(level)
        // Deflater holds native zlib memory; release it when the task
        // ends rather than waiting on finalization.
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit](_ => d.end()))
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          val comp = deflatedSize(d, raw)
          (id, raw.length, comp)
        }
      }
      .toDF("doc_id", "n_bytes", "n_bytes_deflate")
      .withColumn("deflate_ratio",
        when(col("n_bytes") > 0,
          round(col("n_bytes_deflate").cast("double") / col("n_bytes"), 4)))
      .orderBy("doc_id")
  }
}
