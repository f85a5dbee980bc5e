package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to Spark's private[sql] Expression↔Column conversion (the classic
  * backend's ExpressionUtils, spark/sql/core columnNodeSupport.scala).
  * Spark 4 made Column backend-agnostic; libraries adding native Catalyst
  * expressions need this one seam into the classic backend.
  */
object GraftExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
