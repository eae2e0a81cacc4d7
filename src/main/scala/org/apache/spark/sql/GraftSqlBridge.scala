package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `private[sql]` Column ↔ Expression conversion.
  *
  * Spark 4.x hides the classic `Column(expr)` constructor behind
  * `org.apache.spark.sql.classic.ExpressionUtils`, which is `private[sql]`.
  * Placing this one object inside `package org.apache.spark.sql` is the
  * supported-by-scoping access point; everything else in graft stays in its
  * own package and calls through here. No Spark internals are re-implemented.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Fully-converted expression: [[expression]] defers the ColumnNode →
    * Expression conversion behind an `Unevaluable` placeholder that only
    * the Dataset API resolves; use the session's converter when the
    * expression must be evaluable inside a custom physical operator.
    */
  def sessionExpression(spark: SparkSession, c: Column): Expression =
    spark.asInstanceOf[classic.SparkSession].expression(c)

  /** The planner strategies a `SparkSessionExtensions` instance would
    * inject — lets tests assert extension wiring without constructing a
    * second SparkSession (builder.getOrCreate reuses the first).
    */
  def plannerStrategies(exts: SparkSessionExtensions,
      spark: SparkSession): Seq[org.apache.spark.sql.execution.SparkStrategy] =
    exts.buildPlannerStrategies(spark.asInstanceOf[classic.SparkSession])

  /** Wrap a (possibly custom) logical plan as a DataFrame —
    * `classic.Dataset.ofRows` is `private[sql]` in Spark 4.x; this is the
    * injection point for graft's own plan nodes (MatchRecognizeNode).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
