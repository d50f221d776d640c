package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ClassicConversions._

/** Minimal bridge into `private[sql]` constructors that every Spark
  * extension library needs: build a DataFrame from a custom LogicalPlan
  * and convert Column ↔ Expression. This is the standard pattern for
  * out-of-tree Catalyst extensions (a single file in the
  * `org.apache.spark.sql` namespace); everything else in this repo lives
  * under `graft.*`.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)

  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** DataFrame over an RDD of InternalRow — the Tungsten-native twin of
    * `createDataFrame(RDD[Row], schema)`, skipping the external-type
    * converters entirely. Rows must be immutable (fresh UnsafeRow
    * copies, not reused reader buffers).
    */
  def internalCreateDataFrame(
      spark: SparkSession,
      rows: org.apache.spark.rdd.RDD[catalyst.InternalRow],
      schema: types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rows, schema)
}
