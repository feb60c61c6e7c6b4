package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the `private[sql]` classic Column↔Expression converters —
  * the supported extension-point pattern for libraries that add native
  * Catalyst expressions on Spark 4's unified Column API. */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
  /** Build a DataFrame over a logical plan (resolves against the session's
    * live catalog, temp views included). */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
  /** The analyzed logical plan of a DataFrame — for splicing a
    * library-built relation into an analyzer rule's output. */
  def analyzedPlan(df: DataFrame): LogicalPlan = df.queryExecution.analyzed
  /** Eagerly convert a Column to its resolved-at-the-leaves Catalyst tree
    * (`expression` returns a lazy ColumnNode wrapper whose operators are
    * still unresolved function names — useless for structural matching). */
  def catalystExpr(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
  /** Drain the async listener bus — lets tests read SparkListener counters
    * deterministically instead of sleeping. */
  def waitListenerBusEmpty(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
