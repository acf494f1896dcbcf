// Lives under org.apache.spark.sql so it can reach the private[sql]
// Column <-> Expression converters (org.apache.spark.sql.classic
// .ExpressionUtils) — the standard pattern for Spark extension libraries.
package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Full ColumnNode-tree conversion — needed for Columns COMPOSED from
    * `functions._` builders (struct/getField/when/…), which `expression`
    * only wraps lazily and the analyzer then can't type. */
  def composedExpression(c: Column): Expression =
    ColumnNodeToExpressionConverter.apply(c.node)

  /** Plan → DataFrame on an existing session (private[sql] Dataset.ofRows). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
