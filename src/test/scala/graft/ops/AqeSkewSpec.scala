package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Demonstrates AQE's runtime skew-join splitting — the first line of
  * defense before manual salting (SkewJoin) at 100 TB.
  */
class AqeSkewSpec extends AnyFunSuite with SparkSpec {

  test("AQE splits a skewed partition in a sort-merge join") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      // one hot key (0) with 50k rows + uniform tail; payload pads bytes
      val left = spark.range(0, 60000)
        .select(when($"id" < 50000, 0L).otherwise($"id" % 1000).as("k"),
          concat(lit("x" * 100), $"id".cast("string")).as("payload"))
      val right = spark.range(0, 1000).select($"id".as("k"), lit("dim").as("name"))
      val joined = left.join(right, "k")
      // execute THIS dataframe so its AdaptiveSparkPlan reaches the final
      // (re-optimized) state — a separate count() builds a separate tree
      assert(joined.collect().length === 60000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"need a shuffled join for skew handling:\n$plan")
      assert(plan.contains("isSkew=true") || plan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
