package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, ExpressionUtils}

/** Bridge to Spark's private[sql] Expression↔Column conversion (the classic
  * backend's ExpressionUtils, spark/sql/core columnNodeSupport.scala).
  * Spark 4 made Column backend-agnostic; libraries adding native Catalyst
  * expressions need this one seam into the classic backend.
  */
object GraftExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from a raw logical plan (classic `Dataset.ofRows`) — the
    * seam a library needs to hand Catalyst a custom `LogicalPlan` node
    * (e.g. `graft.plans.AsofJoinNode`). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
