package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.col

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY §7.3): an exact
  * (count, min, max) aggregate over a Dataset, used through
  * `groupByKey(...).agg(aggregator.toColumn)` — the type-safe aggregation
  * path, mergeable (associative+commutative) so it map-side combines.
  */
object QtyStats {

  case class Stats(n: Long, minQty: Double, maxQty: Double)

  val aggregator: Aggregator[(String, Double), Stats, Stats] =
    new Aggregator[(String, Double), Stats, Stats] {
      def zero: Stats = Stats(0L, Double.PositiveInfinity, Double.NegativeInfinity)
      def reduce(b: Stats, in: (String, Double)): Stats =
        Stats(b.n + 1, math.min(b.minQty, in._2), math.max(b.maxQty, in._2))
      def merge(a: Stats, b: Stats): Stats =
        Stats(a.n + b.n, math.min(a.minQty, b.minQty), math.max(a.maxQty, b.maxQty))
      def finish(r: Stats): Stats = r
      def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
      def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
    }

  /** Per-returnflag exact quantity stats via the typed path. */
  def perReturnFlag(spark: SparkSession, lineitem: DataFrame): DataFrame = {
    import spark.implicits._
    lineitem.select(col("l_returnflag"), col("l_quantity")).as[(String, Double)]
      .groupByKey(_._1)
      .agg(aggregator.toColumn.name("stats"))
      .toDF("l_returnflag", "stats")
      .select(col("l_returnflag"), col("stats.n").as("n_rows"),
        col("stats.minQty").as("min_qty"), col("stats.maxQty").as("max_qty"))
      .orderBy("l_returnflag")
  }
}
