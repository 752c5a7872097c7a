package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 made the Expression↔Column conversions package-private
  * (`org.apache.spark.sql.classic.ExpressionUtils`); this bridge lives in
  * the sql package namespace to re-export the two functions custom
  * expressions need.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode→Expression conversion. `expression` wraps the column
    * as a lazy ColumnNodeExpression leaf, which only the Dataset API's
    * analysis path unwraps — a FunctionRegistry builder (injectFunction)
    * must return a REAL expression tree or the analyzer leaves
    * UnresolvedFunction nodes inside the opaque leaf and execution dies
    * with INTERNAL_ERROR "Cannot evaluate expression".
    */
  def expressionTree(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)

  /** DataFrame over an already-analyzed logical plan (`Dataset.ofRows` is
    * private[sql] in Spark 4) — used by the MERGE rewrite to execute the
    * statement's resolved source plan as the engine batch input.
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
