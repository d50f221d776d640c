package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, Tables}

class SkewJoinSpec extends AnyFunSuite with SparkSpec {
  val sf = "/root/testdata/sf0.001"

  test("salted join result set equals the plain inner join (semantics preserved)") {
    val li = Tables.lineitem(spark, sf)
    val renamed = Tables.part(spark, sf).withColumnRenamed("p_partkey", "l_partkey")
    val plainRows = li.join(renamed, Seq("l_partkey"), "inner")
      .select("l_orderkey", "l_linenumber", "l_partkey", "p_name")
      .collect().map(_.toSeq).toSet
    val saltedRows = SkewJoin.saltedInnerJoin(li, renamed, "l_partkey")
      .select("l_orderkey", "l_linenumber", "l_partkey", "p_name")
      .collect().map(_.toSeq).toSet
    assert(saltedRows === plainRows)
  }

  test("salt actually spreads a hot key over multiple buckets") {
    import spark.implicits._
    val hot = Seq.fill(1000)((1L, "x")).toDF("k", "payload")
    val dim = Seq((1L, "d")).toDF("k", "name")
    val out = SkewJoin.saltedInnerJoin(hot, dim, "k")
    assert(out.count() === 1000)
    // the salted left side must use more than one distinct salt value
    val salts = hot.withColumn("s",
      (org.apache.spark.sql.functions.rand(42) * 8).cast("int"))
      .select("s").distinct().count()
    assert(salts > 1)
  }
}
