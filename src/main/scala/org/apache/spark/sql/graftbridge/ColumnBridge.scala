package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's Column <-> Expression conversion, which is
  * `private[sql]` in Spark 4 (the Column class wraps ColumnNodes). Living in
  * a subpackage of org.apache.spark.sql grants access — the standard
  * technique for Spark-native extension libraries that define custom
  * Catalyst expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully convert a Column's node tree to a Catalyst expression. Unlike
    * [[expression]], which may wrap the node in an opaque lazy adapter,
    * this runs Spark's own ColumnNode -> Expression converter so the result
    * can be embedded in analyzer-visible positions (e.g. SQL function
    * builders) and resolved normally.
    */
  def resolvedExpression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter.apply(c.node)
}
