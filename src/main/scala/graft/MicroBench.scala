package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Reproducible micro-benchmarks for the native-vs-composed
  * implementation pairs (the numbers quoted in README/COVERAGE).
  * Prints one JSON line. Usage: MicroBench [sfDir]
  */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
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

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val emb = Tables.embeddings(spark, sfDir)
    val a = emb.select(col("vec_id").as("va"), col("embedding").cast("array<double>").as("ea"))
    val b = emb.select(col("vec_id").as("vb"), col("embedding").cast("array<double>").as("eb"))
    val pairs = a.join(b, col("va") < col("vb"))
    def allPairs(sim: DataFrame => org.apache.spark.sql.Column): Long =
      pairs.withColumn("s", sim(pairs)).filter(col("s") > 0.35).count()

    val composedCosine = time(allPairs(df => graft.ext.Similarity.cosine(col("ea"), col("eb"))))
    val nativeCosine = time(allPairs(df => graft.ext.Similarity.nativeCosine(df, col("ea"), col("eb"))))

    val sh = graft.ext.Dedup.shingles(Tables.documents(spark, sfDir))
    val composedMinhash = time(graft.ext.Dedup.minhashSignaturesComposed(sh).count())
    val nativeMinhash = time(graft.ext.Dedup.minhashSignatures(sh).count())

    val docs = Tables.documents(spark, sfDir)
    val composedSimhash = time(graft.ext.Dedup.simhashComposed(docs).count())
    val nativeSimhash = time(graft.ext.Dedup.simhash(docs).count())

    // top-k per key: window-function form (full sort per group) vs the
    // custom partial/final heap operator, on orders fanned out ×40
    // (sf0.1: ~6M rows, group size ×40) — the group-size regime where the
    // map-side bound pays.
    val bigOrders = Tables.orders(spark, sfDir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rep", explode(sequence(lit(0), lit(39))))
      .withColumn("o_orderkey", col("o_orderkey") * 100 + col("rep")).drop("rep")
    bigOrders.cache().count()
    val windowTopK = time {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      bigOrders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3).count()
    }
    val customTopK = time(
      graft.plans.TopKPerKey(bigOrders, Seq("o_custkey"), "o_totalprice", "o_orderkey", 3)
        .count())
    bigOrders.unpersist()

    // columnar tier: single-query scan-scoring, fused ColumnarBatch
    // consumer vs ColumnarToRow + codegen expression, on embeddings
    // fanned out ×40 to parquet (~2M rows) so the scan itself dominates.
    // Written to disk because the fusion point IS the batched file scan.
    val bigPath = java.nio.file.Files.createTempDirectory("graft_mb_emb").toString + "/emb"
    Tables.embeddings(spark, sfDir)
      .withColumn("rep", explode(sequence(lit(0), lit(39))))
      .withColumn("vec_id", col("vec_id") * 100 + col("rep")).drop("rep")
      .write.mode("overwrite").parquet(bigPath)
    val bigEmb = spark.read.parquet(bigPath)
    val qv = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("embedding").cast("array<double>"))
      .collect()(0).getSeq[Double](0).toArray
    def exprScore(): Long = bigEmb.select(
        graft.ext.Similarity.nativeCosine(bigEmb,
          col("embedding").cast("array<double>"),
          array(qv.map(lit).toIndexedSeq: _*)).as("s"))
      .filter(col("s") > 2).count() // filter > 2: force full compute, no rows out
    def fusedScore(): Long = graft.plans.VectorizedCosine.score(bigEmb, qv)
      .filter(col("cosine_sim") > 2).count()
    exprScore(); fusedScore() // warmup both paths
    val exprSec = (1 to 3).map(_ => time(exprScore())).min
    val fusedSec = (1 to 3).map(_ => time(fusedScore())).min

    println(
      s"""{"cosine_all_pairs":{"composed_hof_sec":$composedCosine,"native_expr_sec":$nativeCosine},""" +
      s""""minhash_signatures":{"composed_64col_sec":$composedMinhash,"native_sketch_sec":$nativeMinhash},""" +
      s""""simhash_fingerprints":{"composed_64col_sec":$composedSimhash,"native_sketch_sec":$nativeSimhash},""" +
      s""""topk_per_key_6m":{"window_sec":$windowTopK,"custom_heap_sec":$customTopK},""" +
      s""""scan_score_2m":{"columnar_to_row_expr_sec":$exprSec,"fused_columnar_sec":$fusedSec},""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
