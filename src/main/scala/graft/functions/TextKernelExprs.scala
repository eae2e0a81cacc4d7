package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-document hashing kernels —
  * same bit-exact algorithms as the [[Hashing]] statics, but without the
  * ScalaUDF wrapper: no catalyst↔scala converters per row, signatures
  * return as `UnsafeArrayData.fromPrimitiveArray` (zero boxing for 64
  * longs/doc), and the call inlines into whole-stage codegen.
  */
object TextKernelExprs {

  /** Bridge targets for generated code (stable JVM entry points). */
  def simhashEval(t: UTF8String): Long = Hashing.simHash(t.toString)

  def minhashEval(t: UTF8String, k: Int, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(
      Hashing.minHashSignature(Hashing.shingleHashes(t.toString, k), n))

  def ngramEval(t: UTF8String, n: Int): ArrayData =
    UnsafeArrayData.fromPrimitiveArray(Hashing.wordNgramHashes(t.toString, n))

  def polyHashEval(t: UTF8String): Long = {
    val s = t.toString
    var h = 1125899906842597L // large prime
    var i = 0
    while (i < s.length) { h = 31 * h + s.charAt(i); i += 1 }
    h
  }

  def simhash(text: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(text)))

  def minhashSig(text: Column, shingleK: Int, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinhashSignature(GraftSqlBridge.expression(text), shingleK, numHashes))

  def ngramHashes(text: Column, n: Int): Column =
    GraftSqlBridge.column(NgramHashes(GraftSqlBridge.expression(text), n))

  def polyHash(text: Column): Column =
    GraftSqlBridge.column(PolyHash64(GraftSqlBridge.expression(text)))
}

case class PolyHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.polyHashEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelExprs.polyHashEval($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash64 =
    copy(child = newChild)
}

case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.simhashEval(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelExprs.simhashEval($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

case class MinhashSignature(child: Expression, shingleK: Int, numHashes: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.minhashEval(input.asInstanceOf[UTF8String], shingleK, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernelExprs.minhashEval($c, $shingleK, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

case class NgramHashes(child: Expression, n: Int)
    extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected string input, got ${child.dataType.catalogString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    TextKernelExprs.ngramEval(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernelExprs.ngramEval($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}
