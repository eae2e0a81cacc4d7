package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Native nearest-centroid argmin: `left` is the vector
  * (`array<double>`), `right` the codebook
  * (`array<struct<cid: bigint, cv: array<double>>>`); returns the `cid`
  * minimizing the fixed-order squared distance
  * `dot(x,x) - 2·dot(x,cv) + dot(cv,cv)` with ties to the smaller cid.
  *
  * Semantics are EXACTLY the HOF formulation
  * `element_at(array_sort(transform(cb, c -> struct(dist, cid))), 1).cid`
  * — same sequential-left-fold dots ([[ArrayDotProduct]] order), same
  * distance association, and the comparison runs through
  * `Double.compare` so NaN orders GREATEST like Spark's struct sort —
  * but with `doGenCode` the k·dim loop inlines into whole-stage codegen
  * instead of re-entering the interpreted HOF evaluator per centroid
  * per row (and `dot(x,x)` hoists to once per ROW instead of once per
  * centroid — same value, same bits, k× less work). This is the per-row
  * kernel of k-means assignment and PQ encoding, executed once per
  * vector per Lloyd round over the whole corpus.
  *
  * Null handling: null vector or null codebook → null; an EMPTY
  * codebook → null (the HOF form would ANSI-throw; callers guarantee
  * k ≥ 1 so this is defensive); null codebook entries are skipped; null
  * ELEMENTS inside vectors contribute 0 to dots ([[ArrayDotProduct]]
  * convention).
  */
case class NearestCentroid(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    val okLeft = left.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val okRight = right.dataType match {
      case ArrayType(StructType(Array(f1, f2)), _) =>
        f1.dataType == LongType &&
          (f2.dataType match {
            case ArrayType(DoubleType, _) => true
            case _ => false
          })
      case _ => false
    }
    if (okLeft && okRight) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "nearest_centroid requires (array<double>, " +
        "array<struct<bigint, array<double>>>), got " +
        s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }

  override def nullSafeEval(xv: Any, cbv: Any): Any = {
    val x = xv.asInstanceOf[ArrayData]
    val cb = cbv.asInstanceOf[ArrayData]
    val dxx = dot(x, x)
    var bestCid = 0L
    var bestD = 0.0
    var found = false
    var i = 0
    while (i < cb.numElements()) {
      if (!cb.isNullAt(i)) {
        val entry: InternalRow = cb.getStruct(i, 2)
        val cid = entry.getLong(0)
        val cv = entry.getArray(1)
        val d = dxx - 2.0 * dot(x, cv) + dot(cv, cv)
        val c = java.lang.Double.compare(d, bestD)
        if (!found || c < 0 || (c == 0 && cid < bestCid)) {
          bestD = d; bestCid = cid; found = true
        }
      }
      i += 1
    }
    if (found) bestCid else null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, cb) => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val dxx = ctx.freshName("dxx")
      val d = ctx.freshName("d")
      val dxc = ctx.freshName("dxc")
      val dcc = ctx.freshName("dcc")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val entry = ctx.freshName("entry")
      val bestD = ctx.freshName("bestD")
      val bestCid = ctx.freshName("bestCid")
      val found = ctx.freshName("found")
      val cmp = ctx.freshName("cmp")
      s"""
         |double $dxx = 0.0;
         |for (int $j = 0; $j < $x.numElements(); $j++) {
         |  if (!$x.isNullAt($j)) {
         |    $dxx += $x.getDouble($j) * $x.getDouble($j);
         |  }
         |}
         |double $bestD = 0.0;
         |long $bestCid = 0L;
         |boolean $found = false;
         |for (int $i = 0; $i < $cb.numElements(); $i++) {
         |  if (!$cb.isNullAt($i)) {
         |    InternalRow $entry = $cb.getStruct($i, 2);
         |    long $cid = $entry.getLong(0);
         |    org.apache.spark.sql.catalyst.util.ArrayData $cv =
         |      $entry.getArray(1);
         |    double $dxc = 0.0;
         |    double $dcc = 0.0;
         |    int $n = java.lang.Math.min($x.numElements(), $cv.numElements());
         |    for (int $j = 0; $j < $n; $j++) {
         |      if (!$x.isNullAt($j) && !$cv.isNullAt($j)) {
         |        $dxc += $x.getDouble($j) * $cv.getDouble($j);
         |      }
         |    }
         |    for (int $j = 0; $j < $cv.numElements(); $j++) {
         |      if (!$cv.isNullAt($j)) {
         |        $dcc += $cv.getDouble($j) * $cv.getDouble($j);
         |      }
         |    }
         |    double $d = $dxx - 2.0 * $dxc + $dcc;
         |    int $cmp = java.lang.Double.compare($d, $bestD);
         |    if (!$found || $cmp < 0 || ($cmp == 0 && $cid < $bestCid)) {
         |      $bestD = $d; $bestCid = $cid; $found = true;
         |    }
         |  }
         |}
         |if ($found) {
         |  ${ev.value} = $bestCid;
         |} else {
         |  ${ev.isNull} = true;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroid =
    copy(left = newLeft, right = newRight)
}

object NearestCentroid {
  def column(x: Column, codebook: Column): Column =
    GraftSqlBridge.column(NearestCentroid(
      GraftSqlBridge.expression(x), GraftSqlBridge.expression(codebook)))
}
