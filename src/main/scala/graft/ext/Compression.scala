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

  /** [[compressionSignal]]'s CONTRACT under the exact oracle
    * (`q_compression_ratio` itself is rows-only — the oracle engine has
    * no zlib — but the signal's invariants don't need one): per doc,
    * the exact UTF-8 byte count plus TRUE-iff-held booleans,
    *
    *   - `size_bounded`: the deflated size is positive and at most
    *     raw + 16 + raw/100 (zlib's documented worst-case expansion —
    *     a few header bytes plus 5 per 16 KiB stored block — with
    *     headroom);
    *   - `deterministic`: two INDEPENDENT Deflater instances produce
    *     identical sizes for the same input (the property that makes
    *     the rows-only query re-runnable);
    *   - `repetition_subadditive`: deflate(text‖text) ≤
    *     2·deflate(text) + 16 — the redundancy-detection direction the
    *     signal exists for (a repeated payload never costs more than
    *     two independent copies; for text inside the 32 KiB window it
    *     collapses to near one copy).
    *
    * The DuckDB oracle computes the byte counts and asserts every
    * boolean TRUE, so a hash match certifies the codec contract —
    * the `q_approx_profile_bounds` pattern applied to the lossless
    * codec tier.
    */
  def compressionBounds(spark: SparkSession, documents: DataFrame,
                        level: Int = Deflater.DEFAULT_COMPRESSION): DataFrame = {
    import spark.implicits._
    documents.select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val d = new Deflater(level)
        val d2 = new Deflater(level)
        Option(org.apache.spark.TaskContext.get())
          .foreach(_.addTaskCompletionListener[Unit] { _ => d.end(); d2.end() })
        it.map { case (id, text) =>
          val raw = text.getBytes("UTF-8")
          val c1 = deflatedSize(d, raw)
          val c2 = deflatedSize(d2, raw)
          val doubled = deflatedSize(d, (text + text).getBytes("UTF-8"))
          val bound = raw.length + 16 + raw.length / 100
          (id, raw.length.toLong,
            c1 > 0 && c1 <= bound, c1 == c2, doubled <= 2 * c1 + 16)
        }
      }
      .toDF("doc_id", "n_bytes", "size_bounded", "deterministic",
        "repetition_subadditive")
      .orderBy("doc_id")
  }
}
