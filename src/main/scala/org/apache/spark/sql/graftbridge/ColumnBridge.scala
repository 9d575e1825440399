package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's classic Column ↔ Expression converters, which are
  * `private[sql]` in Spark 4 (the public Column became ColumnNode-based
  * for Spark Connect). Libraries that ship custom Catalyst expressions
  * (graft.functions.DotProduct) need exactly these two calls; hosting
  * the accessor under org.apache.spark.sql is the established pattern
  * for that (same technique Delta/Sedona-style extensions use).
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
