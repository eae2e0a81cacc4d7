package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.ArrayDotProduct

/** `SparkSessionExtensions` injection point — makes the engine's native
  * Catalyst expressions first-class SQL functions, so plan text (static
  * `.plan(…)` or dynamic control-plane plans) can call them without any
  * DataFrame-side helper:
  *
  * {{{
  * SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  * spark.sql("SELECT array_dot(embedding, embedding) FROM embeddings")
  * }}}
  *
  * Spark's own extension mechanism (the reference has no analogue — its
  * extensions are Siddhi `FunctionExecutor`s registered per runtime,
  * SiddhiCEP.java:201-206; ours land in the Catalyst function registry
  * and participate in codegen like built-ins).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.arrayDot)
  }
}

object GraftExtensions {

  /** `array_dot(a, b)` — codegen'd sequential-fold dot product. */
  val arrayDot: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("array_dot"),
    new ExpressionInfo(classOf[ArrayDotProduct].getName, "array_dot"),
    (children: Seq[Expression]) => {
      require(children.length == 2, "array_dot takes exactly 2 arguments")
      ArrayDotProduct(children.head, children(1))
    })

  /** Register on an existing session's registry (tests, REPL). */
  def registerAll(registry: FunctionRegistry): Unit = {
    val (id, info, builder) = arrayDot
    registry.registerFunction(id, info, builder)
  }
}
