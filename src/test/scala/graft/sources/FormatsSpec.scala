package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

class FormatsSpec extends AnyFunSuite with SparkSpec {
  val sf = "/root/testdata/sf0.001"

  def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_$name").toString + "/out"

  test("round-trip: parquet, orc, json, csv preserve rows (explicit schema on text formats)") {
    val src = Tables.customer(spark, sf)
    val expected = src.collect().map(_.toSeq).toSet
    for (fmt <- Seq("parquet", "orc", "json", "csv")) {
      val path = tmp(fmt)
      val opts = if (fmt == "csv") Map("header" -> "false") else Map.empty[String, String]
      Formats.write(src, path, fmt, options = opts)
      val back = Formats.read(spark, path, fmt, Some(src.schema), opts)
      assert(back.collect().map(_.toSeq).toSet === expected, s"format $fmt")
    }
  }

  test("partitioned write prunes partitions on read-back") {
    val path = tmp("part")
    Formats.write(Tables.customer(spark, sf), path, "parquet", Seq("c_mktsegment"))
    val pruned = Formats.read(spark, path, "parquet")
      .filter(col("c_mktsegment") === "FURNITURE")
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment"),
      s"expected partition filter in:\n$plan")
  }

  test("dynamic partition pruning: a dim-side filter prunes fact partitions at runtime") {
    // the 100 TB star-schema read path: the fact is partitioned on a key
    // the query only constrains THROUGH a dimension filter — DPP turns
    // the dim's broadcast result into a runtime partition filter on the
    // fact scan, so unmatched partitions are never read
    val dir = tmp("dpp")
    val orders = Tables.orders(spark, sf)
      .withColumn("order_year", org.apache.spark.sql.functions.year(col("o_orderdate")))
    Formats.write(orders, s"$dir/fact", "parquet", Seq("order_year"))
    val years = orders.select("order_year").distinct()
      .withColumn("label", concat(lit("y"), col("order_year")))
    Formats.write(years, s"$dir/dim", "parquet")
    val fact = Formats.read(spark, s"$dir/fact", "parquet")
    val dim = Formats.read(spark, s"$dir/dim", "parquet").filter(col("label") === "y1995")
    val q = fact.join(dim, "order_year")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"expected a dynamic pruning filter on the fact scan:\n$plan")
    assert(q.count() === orders.filter(col("order_year") === 1995).count())
  }

  test("schema evolution: mergeSchema unions columns across parquet generations") {
    import spark.implicits._
    val path = tmp("evolve")
    // generation 1: (id, name); generation 2 adds a column
    Seq((1L, "a"), (2L, "b")).toDF("id", "name")
      .write.mode("append").parquet(path)
    Seq((3L, "c", 9.5)).toDF("id", "name", "score")
      .write.mode("append").parquet(path)
    val merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert(merged.columns.sorted.toSeq === Seq("id", "name", "score"))
    val rows = merged.collect().map(r =>
      (r.getAs[Long]("id"), Option(r.getAs[Any]("score")))).toMap
    assert(rows(1L) === None) // old files surface null for the new column
    assert(rows(3L) === Some(9.5))
  }

  test("bucketed tables join without an exchange on the bucket key") {
    val o = Tables.orders(spark, sf)
    val li = Tables.lineitem(spark, sf)
    Formats.writeBucketed(o, "orders_b", "o_orderkey", 8)
    Formats.writeBucketed(li.withColumnRenamed("l_orderkey", "o_orderkey"),
      "lineitem_b", "o_orderkey", 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable broadcast so the join strategy actually uses the buckets
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("lineitem_b").join(spark.table("orders_b"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must be exchange-free:\n$plan")
      assert(joined.count() === li.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
