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
}
