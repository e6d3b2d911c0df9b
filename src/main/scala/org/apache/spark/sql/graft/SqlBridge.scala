package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into spark-sql internals (Column <-> catalyst Expression), used
  * to expose custom codegen'd expressions through the public Column API.
  * Lives under org.apache.spark.sql to satisfy private[sql] scoping.
  */
object SqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
