package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column↔Expression conversion — Spark 4
  * moved Column onto ColumnNode, and wrapping a custom Catalyst
  * Expression requires `classic.ExpressionUtils`. Standard pattern for
  * extension libraries shipping native expressions. */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
