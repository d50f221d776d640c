package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Block-max impact pruning (round 18): lossless top-k early
  * termination for the persisted lexical index.
  */
class BlockMaxSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")

  test("pruned probe ≡ exhaustive ranker row for row, with strictly fewer " +
    "scored pairs; bounds hold under the stored scores' rounding") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bmax")
      .toString + "/idx"
    TextOps.bm25IndexInit(d, dir)
    TextOps.bm25ImpactBuild(spark, dir)
    val (pruned, scored, total) =
      TextOps.bm25PrunedInternal(spark, dir, nTerms = 10, topK = 3)
    val exhaustive = TextOps.bm25StoreTopDocs(spark, dir)
      .collect().map(_.toSeq)
    assert(pruned.collect().map(_.toSeq).toSeq === exhaustive.toSeq,
      "block-max pruning must be LOSSLESS — identical result")
    assert(scored < total,
      s"pruning must skip some blocks: scored $scored of $total pairs")
    info(s"scored $scored of $total matched pairs " +
      f"(${100.0 * scored / total}%.1f%%)")
  }

  test("impact lifecycle: append merges additively (≡ fresh build), " +
    "delete recomputes affected buckets, compact rebuilds, and the probe " +
    "refuses under unfolded state") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bmax_lc")
      .toString + "/idx"
    val half = substring(md5(col("doc_id").cast("string")), 1, 1) < "8"
    TextOps.bm25IndexInit(d.filter(half), dir)
    TextOps.bm25ImpactBuild(spark, dir)
    TextOps.bm25IndexAppend(spark, d.filter(!half), dir)
    def impactOf(p: String) = spark.read.parquet(s"$p/impact")
      .select("token", "block", "max_tf", "min_dl", "cnt")
      .collect().map(_.toSeq).sortBy(_.toString)
    val dir2 = java.nio.file.Files.createTempDirectory("graft_bmax_u")
      .toString + "/idx"
    TextOps.bm25IndexInit(d, dir2)
    TextOps.bm25ImpactBuild(spark, dir2)
    assert(impactOf(dir).toSeq === impactOf(dir2).toSeq,
      "append-merged impact must equal the fresh union build")
    assert(TextOps.bm25StoreTopDocsPruned(spark, dir).collect().map(_.toSeq)
      .toSeq === TextOps.bm25TopDocs(d).collect().map(_.toSeq).toSeq)
    // delete: affected buckets recompute; pruned ≡ survivor build
    val victim = col("doc_id") % 5 === 2
    TextOps.bm25IndexDelete(spark, d.filter(victim).select("doc_id"), dir)
    assert(TextOps.bm25StoreTopDocsPruned(spark, dir).collect().map(_.toSeq)
      .toSeq === TextOps.bm25TopDocs(d.filter(!victim)).collect()
      .map(_.toSeq).toSeq,
      "post-delete pruned probe must equal the survivor build")
    // streamed day: the probe refuses (impact covers consolidated
    // postings only); compact folds AND rebuilds the sidecar, after
    // which the pruned probe serves the union
    TextOps.bm25IndexStreamDay(spark, d.filter(victim), 0L, dir)
    intercept[IllegalStateException] {
      TextOps.bm25StoreTopDocsPruned(spark, dir)
    }
    TextOps.bm25IndexCompact(spark, dir)
    assert(TextOps.bm25StoreTopDocsPruned(spark, dir).collect().map(_.toSeq)
      .toSeq === TextOps.bm25TopDocs(d).collect().map(_.toSeq).toSeq,
      "post-compact pruned probe must serve the folded union")
    // the rebuilt sidecar equals a fresh build over the same postings
    assert(impactOf(dir).toSeq === impactOf(dir2).toSeq)
  }
}
