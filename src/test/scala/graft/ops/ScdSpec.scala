package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScdSpec extends AnyFunSuite with SparkSpec {

  def dim(rows: (Long, String, String, Option[String])*): DataFrame = {
    import spark.implicits._
    rows.map { case (k, seg, from, to) => (k, seg, from, to.orNull) }
      .toDF("customer_key", "segment", "valid_from", "valid_to")
  }

  def upd(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.toDF("customer_key", "segment")
  }

  test("scd2Merge: changed rows close + reopen; unchanged and history pass through; new keys insert") {
    val current = dim(
      (1L, "BUILDING", "1992-01-01", None),          // will change → close + reopen
      (2L, "MACHINERY", "1992-01-01", None),         // update identical → untouched
      (3L, "FURNITURE", "1992-01-01", None),         // no update → untouched
      (1L, "OLDSEG", "1990-01-01", Some("1992-01-01"))) // closed history → untouched
    val updates = upd((1L, "PROMO"), (2L, "MACHINERY"), (9L, "NEW"))
    val out = Scd.scd2Merge(current, updates, "customer_key", Seq("segment"), "1998-01-01")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        Option(r.getString(3))))
    assert(out.toSet === Set(
      (1L, "OLDSEG", "1990-01-01", Some("1992-01-01")),
      (1L, "BUILDING", "1992-01-01", Some("1998-01-01")),
      (1L, "PROMO", "1998-01-01", None),
      (2L, "MACHINERY", "1992-01-01", None),
      (3L, "FURNITURE", "1992-01-01", None),
      (9L, "NEW", "1998-01-01", None)))
  }

  test("scd2Merge: null-safe change detection on nullable tracked columns") {
    // null → value and value → null must both count as changes; null → null must not
    val current = dim(
      (1L, null, "1992-01-01", None),
      (2L, "A", "1992-01-01", None),
      (3L, null, "1992-01-01", None))
    val updates = upd((1L, "X"), (3L, null.asInstanceOf[String]))
      .union(upd((2L, null.asInstanceOf[String])))
    val out = Scd.scd2Merge(current, updates, "customer_key", Seq("segment"), "1998-01-01")
    val open = out.filter(col("valid_to").isNull).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(open(1L) === Some("X"), "null→value reopens")
    assert(open(2L) === None, "value→null reopens")
    assert(open(3L) === None, "null→null stays")
    assert(out.count() === 5, "two closes + three opens (key 3 untouched)")
  }

  test("scd2Merge is idempotent for an already-applied batch") {
    val current = dim((1L, "PROMO", "1998-01-01", None))
    val updates = upd((1L, "PROMO"))
    val out = Scd.scd2Merge(current, updates, "customer_key", Seq("segment"), "1998-01-01")
      .collect()
    assert(out.length === 1)
    assert(out(0).getString(1) === "PROMO")
    assert(out(0).getString(2) === "1998-01-01")
    assert(out(0).isNullAt(3))
  }

  test("scd2Merge rejects duplicate update keys at execution, naming the key") {
    // duplicates would multiply through the full-outer join into
    // corrupted history — must fail, not silently inflate
    val current = dim((1L, "A", "1992-01-01", None))
    val updates = upd((1L, "X"), (1L, "Y"), (2L, "Z"))
    val ex = intercept[Exception] {
      Scd.scd2Merge(current, updates, "customer_key", Seq("segment"), "1998-01-01")
        .collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val all = messages(ex).mkString("\n")
    assert(all.contains("more than one update row"), all)
    assert(all.contains("1"), all)
  }
}
