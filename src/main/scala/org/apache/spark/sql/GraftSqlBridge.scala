package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's private[sql] Column ⇄ Expression converters, so graft
  * can wrap its native Catalyst expressions (e.g. CosineSimilarityExpr) as
  * ordinary `Column`s without requiring function registration. This is the
  * standard extension-library pattern for Spark 4's classic API (the
  * converters are stable internals used by every built-in function). */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
