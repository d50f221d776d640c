package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class IncrementalSpec extends AnyFunSuite with SparkSpec {
  val sf = "/root/testdata/sf0.001"

  test("merged incremental rollup equals the full recompute exactly") {
    val ev = Tables.events(spark, sf)
    val stored = Incremental.dailyRollup(ev.filter(to_date(col("ts")) <= lit("2024-01-20")))
    val delta = Incremental.dailyRollup(ev.filter(to_date(col("ts")) > lit("2024-01-20")))
    val merged = Incremental.present(Incremental.mergeRollup(stored, delta)).collect()
    val full = Incremental.present(Incremental.dailyRollup(ev)).collect()
    assert(merged.toSeq === full.toSeq,
      "algebraic merge must be indistinguishable from rescanning history")
  }

  test("merge is associative: day-by-day deltas equal one big merge") {
    val ev = Tables.events(spark, sf)
    val r1 = Incremental.dailyRollup(ev.filter(to_date(col("ts")) <= lit("2024-01-10")))
    val r2 = Incremental.dailyRollup(ev.filter(
      to_date(col("ts")) > lit("2024-01-10") && to_date(col("ts")) <= lit("2024-01-20")))
    val r3 = Incremental.dailyRollup(ev.filter(to_date(col("ts")) > lit("2024-01-20")))
    val stepwise = Incremental.present(
      Incremental.mergeRollup(Incremental.mergeRollup(r1, r2), r3)).collect()
    val full = Incremental.present(Incremental.dailyRollup(ev)).collect()
    assert(stepwise.toSeq === full.toSeq)
  }

  test("rollup survives a parquet round-trip (the stored-table contract)") {
    val ev = Tables.events(spark, sf)
    val path = java.nio.file.Files.createTempDirectory("inc_tbl").toString + "/t"
    Incremental.dailyRollup(ev.filter(to_date(col("ts")) <= lit("2024-01-20")))
      .write.mode("overwrite").parquet(path)
    val stored = spark.read.parquet(path)
    val delta = Incremental.dailyRollup(ev.filter(to_date(col("ts")) > lit("2024-01-20")))
    val merged = Incremental.present(Incremental.mergeRollup(stored, delta)).collect()
    val full = Incremental.present(Incremental.dailyRollup(ev)).collect()
    assert(merged.toSeq === full.toSeq)
  }
}
