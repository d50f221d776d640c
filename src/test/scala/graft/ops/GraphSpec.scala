package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class GraphSpec extends AnyFunSuite with SparkSpec {

  def edges(rows: (String, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("src", "dst", "weight")
  }

  /** Independent in-memory reference: same formula, plain Scala. */
  def simulate(es: Seq[(String, String, Double)], d: Double, iters: Int): Map[String, Double] = {
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val outW = es.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(outW.contains).map(r).sum
      val contrib = es.groupBy(_._2).view.mapValues(
        _.map { case (s, _, w) => r(s) * w / outW(s) }.sum).toMap
      r = nodes.map(v => v ->
        ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dangling / n))).toMap
    }
    r
  }

  test("pageRank: cycle converges to uniform, ranks sum to 1") {
    val es = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0))
    val got = Graph.pageRank(edges(es: _*)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    got.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9))
  }

  test("pageRank: star with dangling leaves matches the reference simulation") {
    val es = Seq(("b", "a", 1.0), ("c", "a", 1.0), ("d", "a", 1.0))
    val got = Graph.pageRank(edges(es: _*)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = simulate(es, 0.85, 10)
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
    want.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9, s"$k: ${got(k)} vs $v") }
    assert(got("a") > got("b"), "hub must outrank dangling leaves")
  }

  test("pageRank: edge weights steer proportional mass") {
    // a sends 3/4 of its mass to b, 1/4 to c
    val es = Seq(("a", "b", 3.0), ("a", "c", 1.0),
      ("b", "a", 1.0), ("c", "a", 1.0))
    val got = Graph.pageRank(edges(es: _*)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = simulate(es, 0.85, 10)
    want.foreach { case (k, v) => assert(math.abs(got(k) - v) < 1e-9) }
    assert(got("b") > got("c"), "heavier edge → more rank")
  }

  test("pageRankDistributed (at-scale path) ≡ local path and simulation") {
    // dangling node `e` exercises the per-round broadcast mass aggregate
    val es = Seq(("a", "b", 2.0), ("b", "c", 1.0), ("c", "a", 1.0),
      ("a", "c", 1.0), ("c", "e", 1.0))
    val dist = Graph.pageRankDistributed(edges(es: _*)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val local = Graph.pageRank(edges(es: _*)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = simulate(es, 0.85, 10)
    assert(math.abs(dist.values.sum - 1.0) < 1e-9)
    want.foreach { case (k, v) =>
      assert(math.abs(dist(k) - v) < 1e-9, s"distributed $k: ${dist(k)} vs $v")
      assert(math.abs(local(k) - v) < 1e-9, s"local $k: ${local(k)} vs $v")
    }
  }

  test("pageRankDistributed with no dangling nodes (skip-branch) ≡ simulation") {
    val es = Seq(("a", "b", 1.0), ("b", "c", 2.0), ("c", "a", 1.0), ("b", "a", 1.0))
    val dist = Graph.pageRankDistributed(edges(es: _*)).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val want = simulate(es, 0.85, 10)
    want.foreach { case (k, v) =>
      assert(math.abs(dist(k) - v) < 1e-9, s"$k: ${dist(k)} vs $v") }
  }
}
