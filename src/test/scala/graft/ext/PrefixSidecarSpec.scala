package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The Matryoshka PREFIX sidecar (round 18): byte-true truncated
  * probes and their lifecycle. The store carries
  * `prefix_codes/d=D/centroid_id=L` (vec_id, pb, psq) — width-d packed
  * prefixes partitioned like `pq_codes` — and the two-stage probe's
  * shortlist reads ONLY those bytes before the exact full-dim rerank.
  */
class PrefixSidecarSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("static store at nProbe = nList: the byte-true grid equals the " +
    "in-memory truncated rerank cell for cell; shortlist scans read only " +
    "prefix files") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prefix")
      .toString + "/idx"
    Similarity.ivfIndexStoreInit(emb, dir)
    Similarity.ivfIndexStorePrefixBuild(spark, dir)
    assert(Similarity.ivfIndexStorePrefixDims(spark, dir) === Seq(16, 32, 64))
    val got = Similarity.ivfIndexStoreTruncatedGrid(spark,
      emb.filter(col("vec_id") < 10), dir).collect().map(_.toSeq)
    val want = Similarity.truncatedRerank(emb).collect().map(_.toSeq)
    assert(got.nonEmpty && got.toSeq === want.toSeq,
      "persisted grid must equal the in-memory instrument on a static store")
    // byte-true: a width-16 scan touches ONLY d=16 files, and the
    // prefix payload is exactly d bytes/row (vs the store's dim)
    val readFiles = spark.read.parquet(s"$dir/prefix_codes/d=16")
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(readFiles.nonEmpty && readFiles.forall(_.contains("/d=16/")),
      "width-16 shortlist must read only the d=16 partitions")
    val Array(widths) = spark.read.parquet(s"$dir/prefix_codes")
      .groupBy("d").agg(max(length(col("pb"))).as("w"))
      .agg(min(col("w") === col("d"))).collect()
    assert(widths.getBoolean(0), "pb must hold exactly d bytes per row")
    // the single-cell probe form returns ranked rows
    val probe = Similarity.ivfIndexStoreTruncatedProbe(spark,
      emb.filter(col("vec_id") < 10), dir, d = 64, nProbe = 16,
      rerank = 10)
    // d = dim at rerank >= k reproduces the exact pruned probe exactly
    val exact = Similarity.ivfIndexStoreProbe(spark,
      emb.filter(col("vec_id") < 10), dir, nProbe = 16)
    assert(probe.collect().map(_.toSeq).toSeq ===
      exact.collect().map(_.toSeq).toSeq,
      "full-width truncated probe must equal the exact store probe")
  }

  test("lifecycle: append is the union build; delete drops victims from " +
    "every width; compact and train re-derive the sidecar") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prefix_lc")
      .toString + "/idx"
    val half = substring(md5(col("vec_id").cast("string")), 1, 1) < "8"
    Similarity.ivfIndexStoreInit(emb.filter(half), dir)
    Similarity.ivfIndexStorePrefixBuild(spark, dir)
    val assigned = Similarity.ivfIndexStoreAppend(spark, emb.filter(!half), dir)
    Similarity.ivfIndexStorePrefixAppend(spark, assigned, dir)
    // append ≡ union build, artifact for artifact
    val dir2 = java.nio.file.Files.createTempDirectory("graft_prefix_u")
      .toString + "/idx"
    Similarity.ivfIndexStoreInit(emb.filter(half), dir2)
    Similarity.ivfIndexStoreAppend(spark, emb.filter(!half), dir2)
    Similarity.ivfIndexStorePrefixBuild(spark, dir2)
    def rowsOf(p: String) = spark.read.parquet(s"$p/prefix_codes")
      .select(col("d"), col("vec_id"), hex(col("pb")).as("pb"), col("psq"),
        col("centroid_id"))
      .collect().map(_.toSeq).sortBy(_.toString)
    assert(rowsOf(dir).toSeq === rowsOf(dir2).toSeq,
      "prefix append must equal the union build")
    // delete: victims leave every width's partitions; the probe then
    // serves survivors only
    val victims = emb.filter(col("vec_id") % 7 === 3).select("vec_id")
    Similarity.ivfIndexStoreDelete(spark, victims, dir)
    val left = spark.read.parquet(s"$dir/prefix_codes")
      .join(victims, Seq("vec_id")).count()
    assert(left === 0L, "deleted ids must leave every prefix width")
    val gridDel = Similarity.ivfIndexStoreTruncatedGrid(spark,
      emb.filter(col("vec_id") < 10), dir).collect().map(_.toSeq)
    assert(gridDel.nonEmpty)
    // stream a day, compact: the fold re-derives the sidecar over the
    // union (day rows gain prefix coverage at the fold, like the
    // lloyd_stats contract)
    val day = emb.filter(col("vec_id") % 7 === 3)
    Similarity.ivfIndexStreamDay(spark, day, 0L, dir)
    Similarity.ivfIndexStoreCompact(spark, dir)
    val nAssign = spark.read.parquet(s"$dir/assignments").count()
    val nPrefix = spark.read.parquet(s"$dir/prefix_codes")
      .filter(col("d") === 16).count()
    assert(nPrefix === nAssign,
      "post-compact prefix coverage must equal the assignment rows")
    // train: values are byte truncations (unchanged), partitioning
    // moves to the new lists — coverage stays total
    Similarity.ivfIndexStoreTrain(spark, dir)
    val nAssignT = spark.read.parquet(s"$dir/assignments").count()
    assert(spark.read.parquet(s"$dir/prefix_codes")
      .filter(col("d") === 16).count() === nAssignT)
    // and the post-train sidecar partitions agree with the assignments
    val mismatched = spark.read.parquet(s"$dir/prefix_codes")
      .filter(col("d") === 16)
      .select(col("vec_id"), col("centroid_id").as("pc"))
      .join(spark.read.parquet(s"$dir/assignments")
        .select("vec_id", "centroid_id"), Seq("vec_id"))
      .filter(col("pc") =!= col("centroid_id")).count()
    assert(mismatched === 0L,
      "prefix partitions must follow the trained list ids")
  }
}
