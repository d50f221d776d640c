package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class ZOrderSpec extends AnyFunSuite with SparkSpec {

  /** Bit-by-bit reference: interleave via per-bit loop. */
  def refInterleave(a: Long, b: Long): Long = {
    var z = 0L
    for (i <- 0 until 31) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
    }
    z
  }

  test("magic-number spread equals the per-bit reference on edge and random inputs") {
    val rnd = new scala.util.Random(7)
    val cases = Seq(0L, 1L, 2L, 3L, 0x7FFFFFFFL, 0x55555555L, 0xAAAAAAAAL) ++
      Seq.fill(200)(rnd.nextLong().abs & 0x7FFFFFFFL)
    for (a <- cases; b <- cases.take(7)) {
      assert(ZOrder.interleave(a, b) === refInterleave(a, b), s"a=$a b=$b")
    }
  }

  test("expression and codegen path agree with the JVM helper") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((5L, 3L), (0L, 0L), (0x7FFFFFFFL, 0x7FFFFFFFL), (12345L, 67890L))
      .toDF("a", "b")
    val got = df.select(ZOrder.zorder(col("a"), col("b"))).collect().map(_.getLong(0))
    val want = Seq((5L, 3L), (0L, 0L), (0x7FFFFFFFL, 0x7FFFFFFFL), (12345L, 67890L))
      .map { case (a, b) => ZOrder.interleave(a, b) }
    assert(got.toSeq === want)
  }

  test("z-order layout bounds BOTH dimensions; single-key sorts leave one at ~full domain") {
    val o = Tables.orders(spark, "/root/testdata/sf0.01")
    val day = datediff(col("o_orderdate").cast("date"), to_date(lit("1992-01-01")))
    /** avg per-file (custkey range, day range) under a given sort order. */
    def avgRanges(sortCol: org.apache.spark.sql.Column): (Double, Double) = {
      val r = o.select(col("o_orderkey"), col("o_custkey"), day.as("day"), sortCol.as("s"))
        .withColumn("file_id", expr("(row_number() OVER (ORDER BY s, o_orderkey) - 1) div 1000"))
        .groupBy("file_id")
        .agg((max(col("o_custkey")) - min(col("o_custkey"))).as("cr"),
          (max(col("day")) - min(col("day"))).as("dr"))
        .agg(avg(col("cr")), avg(col("dr"))).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    graft.functions.GraftFunctions.register(spark)
    val custDomain = 1499.0; val dayDomain = 2404.0
    val (zc, zd) = avgRanges(ZOrder.zorder(col("o_custkey"), day))
    val (cc, cd) = avgRanges(col("o_custkey")) // single-dim clustering
    // z: every file's box is bounded on BOTH dims — predicates on either
    // column skip files
    assert(zc < 0.6 * custDomain, s"z custkey range $zc")
    assert(zd < 0.6 * dayDomain, s"z day range $zd")
    // the trade-off z avoids: clustering by custkey alone leaves day
    // boxes at ~the full domain (no skipping for date predicates)
    assert(cc < 0.1 * custDomain, s"cust-sorted custkey range $cc")
    assert(cd > 0.9 * dayDomain, s"cust-sorted day range $cd")
  }
}
