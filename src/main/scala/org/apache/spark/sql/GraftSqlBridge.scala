package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
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
}
