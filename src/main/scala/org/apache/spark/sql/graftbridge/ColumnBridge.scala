package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Column ⇄ Expression converters
  * (org.apache.spark.sql.classic.ExpressionUtils), needed to expose
  * custom Catalyst expressions (graft.functions.*) through the public
  * Column API. Lives in an org.apache.spark.sql subpackage solely for
  * access; contains no Spark-derived code.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
