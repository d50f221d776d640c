package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import graft.SparkSpec

class CompressionSpec extends AnyFunSuite with SparkSpec {

  def docs(rows: (Long, String)*): DataFrame = {
    import spark.implicits._
    rows.map { case (id, t) => (id, t, "en", "src0", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("compressionBounds: the codec contract holds on planted extremes") {
    // highly repetitive, prose-like, near-random, and empty text all
    // satisfy the three booleans the oracle asserts TRUE
    val rnd = new scala.util.Random(7)
    val d = docs(
      (1L, "ab " * 2000),
      (2L, "the quick brown fox jumps over the lazy dog " * 40),
      (3L, Array.fill(4096)(('!' + rnd.nextInt(90)).toChar).mkString),
      (4L, ""))
    val rows = Compression.compressionBounds(spark, d).collect()
    assert(rows.length === 4)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("size_bounded"), s"doc ${r.getLong(0)} size bound")
      assert(r.getAs[Boolean]("deterministic"), s"doc ${r.getLong(0)} determinism")
      assert(r.getAs[Boolean]("repetition_subadditive"),
        s"doc ${r.getLong(0)} sub-additivity")
    }
    // byte counts are the exact oracle column
    assert(rows.find(_.getLong(0) == 4L).get.getAs[Long]("n_bytes") === 0L)
  }

  test("compressionSignal: repetitive text compresses far below incompressible text") {
    val rng = new scala.util.Random(7)
    val noisy = Array.fill(1000)(rng.nextPrintableChar()).mkString
    val d = docs((1L, "ab" * 500), (2L, noisy))
    val rows = Compression.compressionSignal(spark, d).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Int]("n_bytes") === 1000)
    assert(rows(1L).getAs[Double]("deflate_ratio") < 0.05,
      "a two-char cycle must deflate to a tiny fraction")
    assert(rows(2L).getAs[Double]("deflate_ratio") > 0.5,
      "random printable text must stay mostly incompressible")
  }

  test("compressionSignal is deterministic and NULL-safe on empty text") {
    val d = docs((1L, "the same text" * 10), (2L, ""))
    val a = Compression.compressionSignal(spark, d).collect()
    val b = Compression.compressionSignal(spark, d).collect()
    assert(a.toSeq === b.toSeq, "fixed input + fixed level must deflate identically")
    val empty = a.find(_.getAs[Long]("doc_id") == 2L).get
    assert(empty.getAs[Int]("n_bytes") === 0)
    assert(empty.isNullAt(empty.fieldIndex("deflate_ratio")),
      "empty text reports NULL ratio, not a division artifact")
  }

  test("the deflate stage is narrow: the only exchange is the final sort's") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Compression.compressionSignal(spark, d)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    assert(exchanges <= 1, s"deflate stage must not shuffle:\n$plan")
    assert(plan.contains("rangepartitioning") || exchanges == 0,
      s"only the presentation sort may repartition:\n$plan")
  }
}
