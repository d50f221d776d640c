package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class QualitySpec extends AnyFunSuite with SparkSpec {

  def orders(rows: (Long, java.lang.Long, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.map { case (ok, ck, st, tp) =>
      (ok, Option(ck).map(_.toLong), st, tp, "1995-01-01", "1-URGENT")
    }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
      "o_orderdate", "o_orderpriority")
  }

  def lineitem(rows: (Long, Double, Double)*): DataFrame = {
    import spark.implicits._
    rows.map { case (ok, q, d) => (ok, q, d) }
      .toDF("l_orderkey", "l_quantity", "l_discount")
  }

  def customer(keys: Long*): DataFrame = {
    import spark.implicits._
    keys.map(k => (k, s"c$k", 1, 0.0, "BUILDING"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
  }

  test("checkSuite: planted violations counted exactly, clean checks pass") {
    val o = orders(
      (1L, 10L, "O", 5.0),
      (1L, 20L, "F", 5.0),          // dup pk (1 extra copy)
      (2L, -3L, "X", 0.0),          // sentinel key + bad enum + bad price
      (3L, null, "P", 7.0))         // null custkey: NOT a positivity violation
    val li = lineitem((1L, 10.0, 0.05), (2L, 99.0, 0.5), (42L, 5.0, 0.0))
    val c = customer(10L, 20L)      // -3 is an FK orphan; null is exempt
    val rows = Quality.checkSuite(o, li, c).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(rows("orders_pk_unique") === ((4L, 1L, false)))
    assert(rows("orders_custkey_positive") === ((4L, 1L, false)))
    assert(rows("orders_status_enum") === ((4L, 1L, false)))
    assert(rows("orders_price_positive") === ((4L, 1L, false)))
    assert(rows("lineitem_qty_range") === ((3L, 1L, false)))
    assert(rows("lineitem_discount_range") === ((3L, 1L, false)))
    assert(rows("lineitem_fk_orders") === ((3L, 1L, false)))   // 42 is orphaned
    assert(rows("orders_fk_customer") === ((4L, 1L, false)))   // -3 unmatched, null exempt
  }

  test("checkSuite: empty tables yield vacuous all-pass, not NULL verdicts") {
    val o = orders().limit(0)
    val li = lineitem().limit(0)
    val rows = Quality.checkSuite(o, li, customer().limit(0)).collect()
    assert(rows.length === 8)
    rows.foreach { r =>
      assert(!r.isNullAt(2) && r.getLong(2) === 0L, s"${r.getString(0)} violations")
      assert(!r.isNullAt(3) && r.getBoolean(3), s"${r.getString(0)} pass flag")
    }
  }

  test("checkSuite: clean data yields all-pass with zero violations") {
    val o = orders((1L, 10L, "O", 5.0), (2L, 20L, "F", 6.0))
    val li = lineitem((1L, 1.0, 0.0), (2L, 50.0, 0.1))
    val rows = Quality.checkSuite(o, li, customer(10L, 20L)).collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getBoolean(3)), "all checks must pass")
    assert(rows.forall(_.getLong(2) == 0L))
  }
}
