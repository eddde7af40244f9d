package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between `graft`'s custom Catalyst expressions and the public
  * Column API. Spark 4 routes Column through ColumnNode; the catalyst
  * converters live behind `private[sql]`, so this one-file shim sits in
  * an `org.apache.spark.sql` subpackage — the established pattern for
  * Spark extension libraries (no internals are modified, only wrapped).
  */
object Exprs {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
      plan)
}
