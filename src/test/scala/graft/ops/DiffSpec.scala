package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class DiffSpec extends AnyFunSuite with SparkSpec {

  def snap(rows: (Long, String, Int)*): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "seg", "nk")
  }

  test("snapshotDiff classifies every key; digests are exact") {
    val old = snap((1L, "A", 1), (2L, "B", 2), (3L, "C", 3), (4L, "D", 4))
    val neu = snap((1L, "A", 1),           // unchanged
      (2L, "B2", 2),                       // update (seg)
      (3L, "C", 30),                       // update (nk)
      (5L, "E", 5))                        // insert; 4 deleted
    val rows = Diff.snapshotDiff(old, neu, "k", Seq("seg", "nk")).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(rows === Map(
      "insert" -> ((1L, 5L)),
      "delete" -> ((1L, 4L)),
      "update" -> ((2L, 5L)),       // keys 2 + 3
      "unchanged" -> ((1L, 1L))))
  }

  test("snapshotDiff: null column values compare null-safely") {
    val old = snap((1L, "A", 1)).withColumn("seg",
      org.apache.spark.sql.functions.lit(null).cast("string"))
    val sameNull = old
    val rows = Diff.snapshotDiff(old, sameNull, "k", Seq("seg", "nk")).collect()
    assert(rows.length === 1 && rows(0).getString(0) === "unchanged",
      "null <=> null must classify as unchanged, not update")
  }

  test("snapshotDiff: identical snapshots produce a single unchanged class") {
    val s = snap((1L, "A", 1), (2L, "B", 2))
    val rows = Diff.snapshotDiff(s, s, "k", Seq("seg", "nk")).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("unchanged"))
    assert(rows(0).getLong(1) === 2L)
  }
}
