package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's custom Catalyst expressions.
  * Spark 4 made the conversion utilities `private[sql]`
  * (org.apache.spark.sql.classic.ExpressionUtils), so this one-liner
  * lives in the sql package to re-export them; everything else of graft
  * stays in its own namespace.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** DataFrame from an (already-childed) logical plan — the classic
    * `Dataset.ofRows`, which runs analysis on the injected node.
    */
  def ofRows(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)

  /** A DataFrame's analyzed logical plan (resolved attributes). */
  def analyzedPlan(df: DataFrame): org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed

  /** The planner strategies a SparkSessionExtensions instance would
    * contribute (the build method is private[sql]) — lets tests assert
    * builder-time registration without constructing a second session.
    */
  def plannerStrategies(
      ext: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    ext.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])
}
