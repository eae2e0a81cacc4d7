package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Native Catalyst dot product over two numeric array columns.
  *
  * Semantics are EXACTLY the sequential left fold
  * `aggregate(zip_with(a, b, (x,y) => double(x)*double(y)), 0.0, _+_)`
  * — same element order, same double accumulation — so results are
  * bit-identical to the higher-order-function formulation (and to any
  * sequential oracle), but without materializing the zipped intermediate
  * array per row. With `doGenCode` the loop inlines into whole-stage
  * codegen: this is the hot kernel of the O(candidate-pairs) similarity
  * joins, worth a custom expression per the build guidance (compose
  * built-ins first, custom Expression when the built-ins allocate).
  *
  * Null array elements are treated as 0 contribution; null inputs
  * propagate null (BinaryExpression default).
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  private def elemType(e: Expression): DataType = e.dataType match {
    case ArrayType(et, _) => et
    case other => other
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(e => e.dataType match {
      case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"array_dot requires array<float|double|int|bigint> inputs, " +
        s"got ${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def getter(et: DataType, arr: String, i: String): String = et match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case LongType    => s"(double) $arr.getLong($i)"
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val (lt, rt) = (elemType(left), elemType(right))
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i)) {
        val xv = lt match {
          case FloatType   => x.getFloat(i).toDouble
          case DoubleType  => x.getDouble(i)
          case IntegerType => x.getInt(i).toDouble
          case LongType    => x.getLong(i).toDouble
        }
        val yv = rt match {
          case FloatType   => y.getFloat(i).toDouble
          case DoubleType  => y.getDouble(i)
          case IntegerType => y.getInt(i).toDouble
          case LongType    => y.getLong(i).toDouble
        }
        s += xv * yv
      }
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      val gx = getter(elemType(left), a, i)
      val gy = getter(elemType(right), b, i)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $s += ($gx) * ($gy);
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

object ArrayDotProduct {
  def column(a: Column, b: Column): Column =
    GraftSqlBridge.column(ArrayDotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))
}
