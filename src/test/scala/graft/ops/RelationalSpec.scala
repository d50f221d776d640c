package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class RelationalSpec extends AnyFunSuite with SparkSpec {
  val sf = "/root/testdata/sf0.001"

  test("starJoin: EliminateOuterJoin fires (no LeftOuter survives) and dims broadcast") {
    val df = Relational.starJoin(Tables.lineitem(spark, sf), Tables.orders(spark, sf),
      Tables.part(spark, sf), Tables.supplier(spark, sf), Tables.customer(spark, sf),
      Tables.nation(spark, sf))
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("LeftOuter"),
      "null-rejecting WHERE must rewrite LEFT joins to inner")
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"), "small dims should broadcast")
  }

  test("starJoin row count equals the inner-join count (C3 semantics)") {
    val li = Tables.lineitem(spark, sf)
    val o = Tables.orders(spark, sf)
    val inner = li.join(o, li("l_orderkey") === o("o_orderkey"), "inner").count()
    // all other FKs resolve in the fixture, so star join count == li⋈o inner count
    val star = Relational.starJoin(li, o, Tables.part(spark, sf),
      Tables.supplier(spark, sf), Tables.customer(spark, sf), Tables.nation(spark, sf))
    assert(star.count() === inner)
  }

  test("groupBySum partition-invariance: sums over a repartitioned input are identical") {
    val li = Tables.lineitem(spark, sf)
    val a = Relational.groupBySum(li).collect().toSeq
    val b = Relational.groupBySum(li.repartition(13)).collect().toSeq
    assert(a === b) // decimal-exact sums are summation-order independent
  }

  test("splitParts: missing token is null, not an error") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta"), (2L, "single")).toDF("p_partkey", "p_name")
    val rows = Relational.splitParts(df).collect()
    assert(rows(0).getAs[String]("name_head") === "alpha")
    assert(rows(0).getAs[String]("name_tail") === "beta")
    assert(rows(0).getAs[String]("missing_token") === null)
    assert(rows(1).getAs[String]("name_tail") === null)
  }

  test("windowTopK: deterministic tie-break on order key, at most k per group") {
    import spark.implicits._
    val df = Seq((1L, 10L, 100.0), (1L, 11L, 100.0), (1L, 12L, 100.0), (1L, 13L, 100.0))
      .toDF("o_custkey", "o_orderkey", "o_totalprice")
    val rows = Relational.windowTopK(df, 3).collect()
    assert(rows.length === 3)
    assert(rows.map(_.getAs[Long]("order_key")).toSeq === Seq(10L, 11L, 12L))
  }

  test("filters push down to the parquet scan") {
    val df = Relational.filterSentinel(Tables.orders(spark, sf))
    val physical = df.queryExecution.executedPlan.toString
    assert(physical.contains("PushedFilters") &&
      physical.contains("IsNotNull"), s"expected pushed filters in:\n$physical")
  }

  test("semi/anti join partition the orders universe") {
    val o = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    val withItems = o.join(li, o("o_orderkey") === li("l_orderkey"), "left_semi").count()
    val withoutItems = Relational.antiJoin(o, li).count()
    assert(withItems + withoutItems === o.count())
  }

  test("approxProfile: estimates stay inside the sketch error envelopes of the exact twins") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf)
    val approx = Relational.approxProfile(li).collect()
      .map(r => r.getString(0) -> r).toMap
    val exactDistinct = Relational.countDistinct(li).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_parts")).toMap
    val exactPct = Relational.percentiles(li).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("median_qty")).toMap
    exactDistinct.foreach { case (flag, exact) =>
      val est = approx(flag).getAs[Long]("approx_parts")
      assert(math.abs(est - exact).toDouble / exact < 0.05,
        s"HLL++ estimate $est vs exact $exact for $flag outside 5%")
    }
    exactPct.foreach { case (flag, exact) =>
      val est = approx(flag).getAs[Double]("approx_median_qty")
      // quantities are 1..50: accuracy 10000 on ≤60k rows pins the
      // approximate median within one value step of the interpolated one
      assert(math.abs(est - exact) <= 1.0,
        s"approx median $est vs exact $exact for $flag")
    }
    // single-pass shape: no Expand (the exact count-distinct rewrite)
    val plan = Relational.approxProfile(li).queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), s"approx profile must not Expand:\n$plan")
  }

  test("approxProfileBounds: every error-contract boolean holds (the oracle's TRUE columns)") {
    val li = graft.Tables.lineitem(spark, sf)
    val rows = Relational.approxProfileBounds(li).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("parts_ok", "suppliers_ok", "median_ok", "p90_ok").foreach { c =>
        assert(r.getAs[Boolean](c), s"$c must hold for ${r.getString(0)}")
      }
    }
  }

  test("rollup emits group rows + per-flag subtotals + grand total") {
    val n = Tables.lineitem(spark, sf).select("l_returnflag", "l_linestatus").distinct().count()
    val flags = Tables.lineitem(spark, sf).select("l_returnflag").distinct().count()
    assert(Relational.rollupAgg(Tables.lineitem(spark, sf)).count() === n + flags + 1)
  }

  test("lateralTopPerGroup: LATERAL subquery equals the window top-2 form") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val c = Tables.customer(spark, sf)
    val n = Tables.nation(spark, sf)
    val lat = Relational.lateralTopPerGroup(spark, c, n).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val w = Window.partitionBy(col("c_nationkey"))
      .orderBy(col("c_acctbal").desc, col("c_name"))
    val win = c.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= 2)
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("c_name"), col("c_acctbal")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(lat === win)
    assert(lat.nonEmpty)
  }

  test("skewHistogram: count-of-counts conserves both keys and rows") {
    val li = Tables.lineitem(spark, sf)
    val hist = Relational.skewHistogram(li, "l_orderkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val keys = li.select("l_orderkey").distinct().count()
    assert(hist.map(_._2).sum === keys, "sum of n_keys = distinct keys")
    assert(hist.map { case (size, n) => size * n }.sum === li.count(),
      "sum of size×n_keys = total rows")
    assert(hist.map(_._1).toSeq === hist.map(_._1).sorted.toSeq)
  }
}
