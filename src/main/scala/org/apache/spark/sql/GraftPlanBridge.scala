package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one internal touchpoint a custom whole-operator extension needs:
  * turn a LogicalPlan containing a custom node back into a DataFrame.
  * `Dataset.ofRows` is `private[sql]`, so this bridge lives in the
  * org.apache.spark.sql package — the standard pattern for Catalyst
  * extensions that construct logical plans directly.
  */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Column -> catalyst Expression, converted EAGERLY (Spark 4's
    * ExpressionUtils.expression returns a lazy ColumnNodeExpression
    * wrapper that only standard Dataset operators convert during
    * analysis — inside a custom logical node it would reach the
    * executor unconverted and fail task serialization). */
  def expr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    classic.ColumnNodeToExpressionConverter(c.node)

  /** catalyst Expression -> Column, for expressions Spark ships but does
    * not expose through `functions` (e.g. the runtime-filter bloom pair). */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    classic.ExpressionUtils.column(e)
}
