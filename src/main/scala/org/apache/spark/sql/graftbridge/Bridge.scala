package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{classic, Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the public `Column` API and catalyst `Expression`s.
  *
  * Spark 4 made `Column` representation-agnostic (Spark Connect refactor);
  * the classic-backend converters live in `org.apache.spark.sql.classic`
  * and are `private[sql]`. This shim sits inside the `org.apache.spark.sql`
  * package tree purely to re-export the two converters our custom
  * expressions (graft.functions) need. No Spark internals are modified.
  */
object Bridge {
  /** Wrap a catalyst Expression as a user-facing Column. */
  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** Extract the catalyst Expression backing a (classic) Column. */
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Execute a logical plan and collect its rows (`Dataset.ofRows` is
    * `private[sql]` on the classic backend). Used by IvfProbeRewrite to
    * pre-execute a scalar subquery at optimize time. */
  def runPlan(spark: SparkSession, plan: LogicalPlan): Array[Row] =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
      .collect()

  /** Register a temp SQL function on a live session (the FunctionRegistry
    * is `private[sql]`; for registration at session build time prefer
    * `graft.GraftExtensions` via `spark.sql.extensions`). */
  def registerTempFunction(spark: SparkSession, name: String,
                           builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "built-in")
}
