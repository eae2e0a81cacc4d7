package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass PII scrub kernel: each category's count AND replacement
  * happen in a single matcher walk (append loop), four walks total —
  * versus the declarative chain's eight regex passes (a count plus a
  * replace per category) with projection-collapse recompute on top.
  * Patterns/tokens arrive as constructor data so two instances built
  * from the same spec compare equal (Seq, not Array — the
  * canonicalization rule).
  */
final class PiiScrubber(patterns: Array[String], tokens: Array[String])
    extends Serializable {
  require(patterns.length == tokens.length)
  @transient private lazy val compiled =
    patterns.map(java.util.regex.Pattern.compile)

  /** Returns (counts per category, redacted text). */
  def scrub(s: UTF8String): (Array[Long], String) = {
    var cur = s.toString
    val counts = new Array[Long](patterns.length)
    var i = 0
    while (i < patterns.length) {
      val m = compiled(i).matcher(cur)
      if (m.find()) {
        val sb = new java.lang.StringBuilder(cur.length)
        var n = 0L
        do {
          n += 1
          m.appendReplacement(sb, tokens(i))
        } while (m.find())
        m.appendTail(sb)
        counts(i) = n
        cur = sb.toString
      }
      i += 1
    }
    (counts, cur)
  }
}

/** Codegen'd whole-document PII scrub (see [[PiiScrubber]]): returns
  * `struct(n_0, …, n_k-1, redacted)` — one kernel call per document in
  * the generated code, the DsirScore reference-object pattern.
  */
case class PiiScrub(child: Expression, patterns: Seq[String],
    tokens: Seq[String]) extends UnaryExpression {
  require(patterns.length == tokens.length,
    s"${patterns.length} patterns vs ${tokens.length} tokens")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${other.catalogString}")
  }
  override def dataType: DataType = StructType(
    patterns.indices.map(i => StructField(s"n_$i", LongType,
      nullable = false)) :+
      StructField("redacted", StringType, nullable = false))
  private lazy val scrubber =
    new PiiScrubber(patterns.toArray, tokens.toArray)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.piiScrubEval(input.asInstanceOf[UTF8String], scrubber)
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val sRef = ctx.addReferenceObj("piiScrubber", scrubber,
      classOf[PiiScrubber].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.piiScrubEval($c, $sRef)")
  }
  override protected def withNewChildInternal(newChild: Expression): PiiScrub =
    copy(child = newChild)
}

object PiiKernel {
  def scrub(text: Column, patterns: Seq[String],
      tokens: Seq[String]): Column =
    GraftSqlBridge.column(
      PiiScrub(GraftSqlBridge.expression(text), patterns, tokens))
}
