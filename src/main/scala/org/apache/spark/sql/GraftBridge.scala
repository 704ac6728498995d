/*
 * Lives in org.apache.spark.sql to reach the private[sql] Column ↔
 * Expression converters — the standard pattern for Spark-ecosystem
 * libraries that define native Catalyst expressions against the Spark 4
 * (Connect-split) Column API.
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Materialize a custom LogicalPlan as a DataFrame (classic sessions). */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
