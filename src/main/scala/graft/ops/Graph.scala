package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank by distributed power iteration — the second graph
  * primitive next to [[graft.ext.Dedup.connectedComponents]]: importance
  * scoring over an edge list (src, dst, weight). Every round is pure
  * DataFrame ops — edges join ranks on src (shuffle on the edge key),
  * contributions aggregate on dst with map-side combine — so the graph
  * scales out like any keyed join; only ONE scalar (the dangling-node
  * mass) reaches the driver per round, mirroring the convergence scalar
  * of connectedComponents.
  *
  * r_i = (1-d)/N + d·(Σ_{j→i} r_j·w_ji/w_out(j) + dangling/N), fixed
  * iteration count. Rank sums stay 1 by construction (tested against an
  * independent in-memory simulation to 1e-9).
  */
object Graph {

  def pageRank(edges: DataFrame, damping: Double = 0.85, iters: Int = 10): DataFrame = {
    val nodes = edges.select(col("src").as("node"))
      .unionByName(edges.select(col("dst").as("node")))
      .distinct().cache()
    val n = nodes.count().toDouble
    val outW = edges.groupBy("src").agg(sum(col("weight")).as("w_out")).cache()
    // per-edge transition probability; reused every round — pin it
    val trans = edges.join(outW, "src")
      .select(col("src"), col("dst"), (col("weight") / col("w_out")).as("p"))
      .cache()
    var ranks = nodes.select(col("node"), lit(1.0 / n).as("rank"))
      .localCheckpoint(true)
    for (_ <- 1 to iters) {
      // dangling nodes (no out-edges) spread their mass uniformly; one
      // scalar aggregate per round is all the driver ever sees
      val danglingRow = ranks.join(outW, ranks("node") === outW("src"), "left_anti")
        .agg(sum(col("rank"))).collect()(0)
      val dangling = if (danglingRow.isNullAt(0)) 0.0 else danglingRow.getDouble(0)
      val contrib = trans.join(ranks, trans("src") === ranks("node"))
        .select(col("dst").as("node"), (col("p") * col("rank")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + lit(dangling / n)))
            .as("rank"))
        .localCheckpoint(false) // materialized by next round's dangling agg
      ranks.unpersist(false)
      ranks = next
    }
    val out = ranks.orderBy("node").persist()
    out.count()
    Seq(nodes, outW, trans).foreach(_.unpersist(false))
    out
  }
}
