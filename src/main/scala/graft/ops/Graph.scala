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
      // dangling nodes (no out-edges) spread their mass uniformly. The
      // mass stays IN the plan as a broadcast 1-row aggregate instead of
      // a per-round collect — so each round is exactly ONE job (the
      // eager checkpoint below), nothing reaches the driver
      val dangling = ranks.join(outW, ranks("node") === outW("src"), "left_anti")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("dangling"))
      val contrib = trans.join(ranks, trans("src") === ranks("node"))
        .select(col("dst").as("node"), (col("p") * col("rank")).as("c"))
        .groupBy("node").agg(sum(col("c")).as("c"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(dangling))
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * (coalesce(col("c"), lit(0.0)) + col("dangling") / n))
            .as("rank"))
        .localCheckpoint(true) // one materialization job per round
      ranks.unpersist(false)
      ranks = next
    }
    val out = ranks.orderBy("node").persist()
    out.count()
    Seq(nodes, outW, trans).foreach(_.unpersist(false))
    out
  }
}
