package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.SparkSpec

/** Pins the two-pass range-partitioned ordinal/cumsum
  * ([[GlobalOrder]]) exactly equal to the single-reducer global-window
  * forms it replaces — on the adversarial beds the VERDICT asked for:
  * ties on the order key, heavy skew, more partitions than rows (empty
  * partitions), leading NULL values, and an empty frame.
  */
class GlobalOrderSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def windowForm(df: org.apache.spark.sql.DataFrame,
                         order: Seq[org.apache.spark.sql.Column]) = {
    val w = Window.orderBy(order: _*)
    val ws = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("ord", row_number().over(w).cast("long") - 1)
      .withColumn("cum_value", sum(col("v")).over(ws))
  }

  private def check(df: org.apache.spark.sql.DataFrame,
                    order: Seq[org.apache.spark.sql.Column],
                    numPartitions: Int): Unit = {
    val got = GlobalOrder.withOrdinal(df, order, valueCol = Some("v"),
        numPartitions = numPartitions)
    val exp = graft.SparkSpec.expectGlobalWindow(windowForm(df, order)
      .select((df.columns.map(col) :+ col("ord") :+ col("cum_value")).toSeq: _*)
      .collect().map(_.toSeq).toSeq)
    val gotRows = got.df.orderBy(col("ord")).collect().map(_.toSeq).toSeq
    assert(gotRows === exp, s"two-pass must equal the window form (np=$numPartitions)")
    assert(got.totalRows === df.count())
    val expSum = df.agg(sum(col("v"))).collect()(0)
    assert(got.totalValue === (if (expSum.isNullAt(0)) 0L else expSum.getLong(0)))
  }

  test("ties + skew: equals window form at several partition counts") {
    // 70% of rows tie on key=5 (skew bucket), the rest spread; unique
    // tiebreak id makes the order total
    val d = (1 to 200).map { i =>
      val key = if (i % 10 < 7) 5 else i % 10
      (i.toLong, key, (i % 13).toLong)
    }.toDF("id", "key", "v")
    for (np <- Seq(1, 3, 7, 32)) // 32 partitions >> 10 distinct keys
      check(d, Seq(col("key"), col("id")), np)
  }

  test("descending order key, more partitions than rows") {
    val d = (1 to 5).map(i => (i.toLong, i * 10, i.toLong)).toDF("id", "key", "v")
    check(d, Seq(col("key").desc, col("id")), 8)
  }

  test("leading NULL values: cum is NULL until the first non-NULL, SQL-style") {
    val d = Seq[(Long, java.lang.Long)]((1L, null), (2L, null), (3L, 7L),
      (4L, null), (5L, 2L)).toDF("id", "v")
    val got = GlobalOrder.withOrdinal(d, Seq(col("id")), Some("v"),
        numPartitions = 3)
      .df.orderBy("ord").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) null else r.getLong(3): java.lang.Long))
    assert(got.toSeq === Seq(
      (1L, 0L, null), (2L, 1L, null), (3L, 2L, 7L: java.lang.Long),
      (4L, 3L, 7L: java.lang.Long), (5L, 4L, 9L: java.lang.Long)))
  }

  test("empty frame: empty result, zero totals") {
    val d = Seq.empty[(Long, Long)].toDF("id", "v")
    val got = GlobalOrder.withOrdinal(d, Seq(col("id")), Some("v"), numPartitions = 4)
    assert(got.df.count() === 0L)
    assert(got.totalRows === 0L && got.totalValue === 0L)
  }

  test("ordinal-only mode (no value column) and deterministic re-run") {
    val d = (1 to 50).map(i => (i.toLong, (i * 37 % 11).toLong)).toDF("id", "v")
    val a = GlobalOrder.withOrdinal(d, Seq(col("v"), col("id")), None,
      numPartitions = 5).df.collect().map(_.toSeq).sortBy(_.toString)
    val b = GlobalOrder.withOrdinal(d, Seq(col("v"), col("id")), None,
      numPartitions = 5).df.collect().map(_.toSeq).sortBy(_.toString)
    assert(a.toSeq === b.toSeq)
    assert(a.map(_.last.asInstanceOf[Long]).sorted.toSeq === (0L until 50L))
  }

  test("the range shuffle actually spreads the data (no single reducer)") {
    val d = (1 to 1000).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val parted = d.repartitionByRange(8, col("id")).sortWithinPartitions(col("id"))
    val sizes = parted.rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(sizes.count(_ > 0) > 1, "rows must land in multiple range partitions")
    assert(sizes.max < 1000, "no partition may hold the whole input")
  }

  test("AQE cannot coalesce the default range exchange to one partition") {
    // regression: a number-less repartitionByRange is fair game for AQE
    // partition coalescing — a narrow corpus under the 64 MB advisory
    // size collapsed to ONE partition, recreating the single-task global
    // sort the two-pass exists to avoid. withOrdinal must always pass an
    // explicit (user-specified, coalescing-exempt) count.
    val d = (1 to 10000).map(i => (i.toLong, i.toLong)).toDF("id", "v")
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val got = GlobalOrder.withOrdinal(d, Seq(col("id")), Some("v"))
    val n = spark.sessionState.conf.numShufflePartitions
    assert(got.df.rdd.getNumPartitions === n,
      s"default path must keep the session's $n shuffle partitions under AQE")
    // and the input pin must not linger after the call (compare against
    // pre-call state — the session is shared across suites)
    assert(spark.sparkContext.getPersistentRDDs.keySet.subsetOf(before),
      "withOrdinal must release its input pin after pass 1")
  }
}
