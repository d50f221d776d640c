package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-stress harness: replicates the sf0.1 tables ×N with key offsets
  * (join semantics preserved — each replica is a disjoint key space) to
  * exercise the heavy operators at sf1-equivalent volume on this
  * machine. Prints one JSON line of per-query seconds.
  * Usage: StressBench [sfDir] [factor]
  */
object StressBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val factor = if (args.length > 1) args(1).toInt else 10
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000L).selectExpr("sum(id)").collect() // warmup

    def replicate(df: DataFrame, keyCols: Seq[String], offset: Long): DataFrame =
      (0 until factor).map { i =>
        keyCols.foldLeft(df)((d, c) => d.withColumn(c, col(c) + lit(i * offset)))
      }.reduce(_ unionByName _)

    val KEY_OFFSET = 100000000L
    val li = replicate(Tables.lineitem(spark, sfDir), Seq("l_orderkey"), KEY_OFFSET)
    val o = replicate(Tables.orders(spark, sfDir), Seq("o_orderkey", "o_custkey"), KEY_OFFSET)
    val c = replicate(Tables.customer(spark, sfDir), Seq("c_custkey"), KEY_OFFSET)
    val docs = replicate(Tables.documents(spark, sfDir), Seq("doc_id"), KEY_OFFSET)
    val emb = replicate(Tables.embeddings(spark, sfDir), Seq("vec_id"), KEY_OFFSET)

    def time(name: String, f: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      (name, (System.nanoTime() - t0) / 1e9, n)
    }

    val results = Seq(
      time("star_join", ops.Relational.starJoin(li, o, Tables.part(spark, sfDir),
        Tables.supplier(spark, sfDir), c, Tables.nation(spark, sfDir)).count()),
      time("groupby_sum", ops.Relational.groupBySum(li).count()),
      time("window_topk", ops.Relational.windowTopK(o).count()),
      time("custom_topk", plans.TopKPerKey(o, Seq("o_custkey"), "o_totalprice",
        "o_orderkey", 3).count()),
      time("sessionize", ext.Events.sessionize(
        replicate(Tables.events(spark, sfDir), Seq("event_id", "user_id"), KEY_OFFSET)).count()),
      time("minhash_neardup", ext.Dedup.minhashNearDup(docs).count()),
      time("cosine_topk", ext.Similarity.cosineTopK(emb).count()),
      time("hll_distinct", {
        li.agg(functions.HllSketch.hll_distinct(spark, col("l_partkey"))).collect()(0).getLong(0)
      }))

    val rows = li.count()
    val qs = results.map { case (k, v, n) => s""""$k":{"sec":$v,"rows":$n}""" }
      .mkString("{", ",", "}")
    println(s"""{"factor":$factor,"lineitem_rows":$rows,"queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
