package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

class DatesSpec extends AnyFunSuite with SparkSpec {

  def convert(days: Seq[java.lang.Integer], useUdf: Boolean = false): Seq[String] = {
    import spark.implicits._
    val df = days.map(d => Tuple1(d)).toDF("d")
    val c = if (useUdf) Dates.sasDaysToIsoUdf(col("d")) else Dates.sasDaysToIso(col("d"))
    df.select(c).collect().map(_.getString(0)).toSeq
  }

  test("null-and-zero rule: both null and 0 map to null (reference falsy-zero rule)") {
    assert(convert(Seq(null, 0)) === Seq(null, null))
    assert(convert(Seq(null, 0), useUdf = true) === Seq(null, null))
  }

  test("known dates: day 1 = 1960-01-02, day 20566 = 2016-04-22") {
    assert(convert(Seq(1, 20566)) === Seq("1960-01-02", "2016-04-22"))
  }

  test("property: builtin and UDF forms agree on 200 seeded-random day numbers") {
    val rng = new scala.util.Random(42)
    val days = Seq.fill(200)(Int.box(rng.nextInt(40000) + 1))
    assert(convert(days) === convert(days, useUdf = true))
  }

  test("property: round-trip iso → datediff from epoch = original days") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val days = Seq(1, 100, 9999, 20566, 40000) ++ Seq.fill(100)(rng.nextInt(40000) + 1)
    val df = days.map(Int.box).map(d => Tuple1(d)).toDF("d")
    val back = df.select(
      datediff(to_date(Dates.sasDaysToIso(col("d"))), to_date(lit("1960-01-01"))).as("rt"))
      .collect().map(_.getInt(0)).toSeq
    assert(back === days)
  }
}
