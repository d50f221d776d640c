package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}

/** Weighted PageRank — the second graph primitive next to
  * [[graft.ext.Dedup.connectedComponents]]: importance scoring over an
  * edge list (src, dst, weight).
  *
  * r_i = (1-d)/N + d·(Σ_{j→i} r_j·w_ji/w_out(j) + dangling/N), fixed
  * iteration count. Rank sums stay 1 by construction (tested against an
  * independent in-memory simulation to 1e-9).
  *
  * Execution is ADAPTIVE, the same way Spark picks a broadcast join for
  * a sub-threshold build side: an edge list small enough to broadcast
  * is collected once and iterated in-memory on the driver (10 rounds of
  * distributed jobs on a 20-node graph is pure scheduler overhead),
  * while anything larger runs the distributed power iteration — keyed
  * joins + map-side-combined aggregations that scale out like any
  * shuffle. Both paths compute the identical formula; GraphSpec pins
  * them against each other and the reference simulation to 1e-9.
  */
object Graph {

  /** Adaptive entry point: local iteration below `localEdgeThreshold`
    * edges (broadcast-sized), distributed power iteration above it.
    */
  def pageRank(edges: DataFrame, damping: Double = 0.85, iters: Int = 10,
               localEdgeThreshold: Long = 500000L): DataFrame = {
    val pinned = edges.persist()
    val nEdges = pinned.count()
    val out = if (nEdges <= localEdgeThreshold) pageRankLocal(pinned, damping, iters)
              else pageRankDistributed(pinned, damping, iters)
    pinned.unpersist(false)
    out
  }

  /** Driver-local power iteration over a collected edge list — the
    * "broadcast" regime. One collect of (src, dst, weight), zero jobs
    * per round.
    */
  private def pageRankLocal(edges: DataFrame, damping: Double, iters: Int): DataFrame = {
    val spark = edges.sparkSession
    val es: Array[(Any, Any, Double)] = edges
      .select(col("src"), col("dst"), col("weight").cast("double"))
      .collect().map(r => (r.get(0), r.get(1), r.getDouble(2)))
    val nodes: Array[Any] = (es.map(_._1) ++ es.map(_._2)).distinct
    val n = nodes.length.toDouble
    val outW: Map[Any, Double] =
      es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val danglingNodes = nodes.filterNot(outW.contains)
    var r: Map[Any, Double] = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = danglingNodes.iterator.map(r).sum
      val contrib: Map[Any, Double] = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => r(s) * w / outW(s) }.sum).toMap
      r = nodes.map(v => v ->
        ((1.0 - damping) / n +
          damping * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    val nodeField = edges.select(col("src")).schema.fields.head
    val schema = StructType(Seq(
      StructField("node", nodeField.dataType, nullable = nodeField.nullable),
      StructField("rank", DoubleType, nullable = false)))
    val rows = nodes.map(v => Row(v, r(v))).toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .orderBy("node")
  }

  /** Distributed power iteration — the at-scale regime. Every round is
    * pure DataFrame ops: edges join ranks on src (shuffle on the edge
    * key), contributions aggregate on dst with map-side combine. The
    * dangling-node SET is fixed, so it is computed once; when empty
    * (every node has an out-edge — the common case for transition
    * graphs) the per-round dangling aggregate is skipped entirely, and
    * the per-round mass otherwise stays in-plan as a broadcast 1-row
    * aggregate — nothing per-node ever reaches the driver.
    */
  def pageRankDistributed(edges: DataFrame, damping: Double = 0.85,
                          iters: Int = 10): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().cache()
    val n = nodes.count().toDouble
    val outW = edges.groupBy("src").agg(sum(col("weight")).as("w_out")).cache()
    // per-edge transition probability; reused every round — pin it
    val trans = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("weight") / col("w_out")).as("p"))
      .cache()
    val danglingNodes = nodes.join(outW, nodes("node") === outW("src"), "left_anti")
      .select(col("node")).cache()
    val hasDangling = danglingNodes.count() > 0
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      val contrib = trans.join(ranks, trans("src") === ranks("node"))
        .select(col("dst").as("node"), (col("p") * col("rank")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      val withBase = nodes.join(contrib, Seq("node"), "left")
      val next =
        if (hasDangling) {
          // the mass stays IN the plan as a broadcast 1-row aggregate
          val dangling = danglingNodes.join(ranks, Seq("node"))
            .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling"))
          withBase.crossJoin(broadcast(dangling))
            .select(col("node"),
              (lit((1.0 - damping) / n) +
                lit(damping) * (coalesce(col("c"), lit(0.0)) + col("dangling") / n))
                .as("rank"))
        } else {
          withBase.select(col("node"),
            (lit((1.0 - damping) / n) +
              lit(damping) * coalesce(col("c"), lit(0.0))).as("rank"))
        }
      // `ranks` can have two consumers per round (contrib join + mass
      // sum) — materialize each round so lineage stays bounded.
      val mat = next.localCheckpoint(true)
      ranks.unpersist(false)
      ranks = mat
    }
    val out = ranks.orderBy("node").persist()
    out.count()
    Seq(nodes, outW, trans, danglingNodes, ranks).foreach(_.unpersist(false))
    out
  }
}
