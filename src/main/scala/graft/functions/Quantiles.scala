package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Mergeable quantile histogram for non-negative longs — the engine's
  * single-pass distributed-quantiles primitive.
  *
  * Values bucket into a log-scale histogram: `[0, 32)` maps to its own
  * bucket per value (exact), larger values to `(exponent, 4-bit
  * mantissa)` buckets — 960 buckets total covering the full positive
  * long range with ≤ 1/16 relative error. Bucket counts are plain sums,
  * so the sketch is COMMUTATIVE and merge-order independent: map-side
  * partial aggregation works, streaming state merges exactly, and the
  * result is bit-deterministic on any engine that reproduces the
  * integer bucket math (the DuckDB oracle does, via `len(bin(v))`).
  *
  * Compare percentile_approx: Spark's built-in sketch is neither
  * merge-order deterministic nor replicable externally; this one trades
  * a little resolution for exact reproducibility — the property the
  * correctness gate (and any lineage-audited pipeline) needs.
  *
  * Memory: 960 longs (7.5 KiB) per group — sized for coarse group-bys
  * (per tenant/type/day), not per-user cardinalities.
  */
object Quantiles {

  val NumBuckets: Int = 32 + 58 * 16 // exponents 5..62 → 960

  /** Bucket index of a non-negative long (negatives clamp to bucket 0). */
  def bucketOf(v: Long): Int =
    if (v <= 0L) 0
    else if (v < 32L) v.toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      32 + (e - 5) * 16 + ((v >>> (e - 4)) & 15L).toInt
    }

  /** Smallest value that lands in bucket `b` (the reported quantile). */
  def lowerBound(b: Int): Long =
    if (b < 32) b.toLong
    else {
      val e = 5 + (b - 32) / 16
      val m = (b - 32) % 16
      (16L + m) << (e - 4)
    }

  /** Bucket index holding rank `ceil(q*n)`; -1 on an empty histogram.
    * `q` outside [0, 1] is a caller bug — fail fast rather than let the
    * rank exceed n and fall through to lowerBound(959) ≈ 2^62.
    */
  private def quantileBucket(counts: ArrayData, q: Double): Int = {
    require(q >= 0.0 && q <= 1.0,
      s"quantile fraction must be in [0, 1], got $q")
    val c = counts.toLongArray()
    var n = 0L
    var i = 0
    while (i < c.length) { n += c(i); i += 1 }
    if (n == 0L) -1
    else {
      val r = math.max(1L, math.ceil(q * n).toLong)
      var cum = 0L
      i = 0
      while (i < c.length) {
        cum += c(i)
        if (cum >= r) return i
        i += 1
      }
      c.length - 1
    }
  }

  /** Rank-`ceil(q*n)` bucket lower bound; -1 on an empty histogram. */
  def quantileEval(counts: ArrayData, q: Double): Long = {
    val b = quantileBucket(counts, q)
    if (b < 0) -1L else lowerBound(b)
  }

  /** EXCLUSIVE upper bound of the rank-`ceil(q*n)` bucket (= the next
    * bucket's lower bound) — the right cut for a "keep up to the pXX
    * bucket" band gate: `v < quantileUbEval(h, 0.9)` keeps everything
    * in or below the p90 bucket, where the lower bound would drop the
    * p90 bucket's own contents (observed: a corpus whose values share
    * one coarse log-bucket makes every lower-bound band empty).
    * Long.MaxValue when the quantile lands in the last bucket; -1 on an
    * empty histogram.
    */
  def quantileUbEval(counts: ArrayData, q: Double): Long = {
    val b = quantileBucket(counts, q)
    if (b < 0) -1L
    else if (b >= NumBuckets - 1) Long.MaxValue
    else lowerBound(b + 1)
  }

  /** Aggregate: histogram of a long column (`array<bigint>` of counts). */
  def qhist(value: Column): Column =
    GraftSqlBridge.column(
      QhistAgg(GraftSqlBridge.expression(value)).toAggregateExpression())

  /** Scalar: quantile lower bound out of a [[qhist]] histogram. */
  def quantile(hist: Column, q: Double): Column =
    GraftSqlBridge.column(QhistQuantile(
      GraftSqlBridge.expression(hist), Literal(q)))

  /** Scalar: EXCLUSIVE quantile-bucket upper bound ([[quantileUbEval]]). */
  def quantileUb(hist: Column, q: Double): Column =
    GraftSqlBridge.column(QhistQuantileUb(
      GraftSqlBridge.expression(hist), Literal(q)))
}

/** `graft_qhist(longCol)` — see [[Quantiles]]. Buffer = dense long[960];
  * serialized as little-endian bytes for the partial-aggregate exchange.
  */
case class QhistAgg(child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_qhist expects bigint, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Quantiles.NumBuckets)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) buf(Quantiles.bucketOf(v.asInstanceOf[Long])) += 1L
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    UnsafeArrayData.fromPrimitiveArray(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): QhistAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): QhistAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): QhistAgg =
    copy(child = newChild)
}

/** `graft_qhist_quantile(hist, q)` — quantile lower bound from a
  * [[QhistAgg]] histogram; -1 on an empty histogram (never a valid
  * result: bucket 0's bound is 0).
  */
/** Shared shell of the two quantile-extraction scalars: `(hist, q)`
  * typing, the analysis-time literal-fraction check, and the codegen
  * pattern — subclasses pick the static eval method (`evalMethod`).
  */
sealed abstract class QhistQuantileBase extends BinaryExpression {
  /** Static method on [[Quantiles]] this expression dispatches to. */
  protected def evalMethod: String
  override def checkInputDataTypes(): TypeCheckResult =
    if (!(KernelTypes.isLongArray(left.dataType) &&
        right.dataType == DoubleType))
      TypeCheckResult.TypeCheckFailure(
        s"expected (array<bigint>, double), got ${left.dataType.catalogString}" +
          s" / ${right.dataType.catalogString}")
    else if (right.foldable) right.eval() match {
      // catch a bad literal fraction at analysis time, not per row
      case q: java.lang.Double if q < 0.0 || q > 1.0 =>
        TypeCheckResult.TypeCheckFailure(
          s"quantile fraction must be in [0, 1], got $q")
      case _ => TypeCheckResult.TypeCheckSuccess
    }
    else TypeCheckResult.TypeCheckSuccess
  override def dataType: DataType = LongType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (h, q) =>
      s"${ev.value} = graft.functions.Quantiles.$evalMethod($h, $q);")
}

case class QhistQuantile(left: Expression, right: Expression)
    extends QhistQuantileBase {
  override protected def evalMethod: String = "quantileEval"
  override def nullSafeEval(h: Any, q: Any): Any =
    Quantiles.quantileEval(h.asInstanceOf[ArrayData], q.asInstanceOf[Double])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QhistQuantile =
    copy(left = newLeft, right = newRight)
}

/** [[QhistQuantile]]'s exclusive-upper-bound sibling
  * ([[Quantiles.quantileUbEval]]) — same typing/validation rules.
  */
case class QhistQuantileUb(left: Expression, right: Expression)
    extends QhistQuantileBase {
  override protected def evalMethod: String = "quantileUbEval"
  override def nullSafeEval(h: Any, q: Any): Any =
    Quantiles.quantileUbEval(h.asInstanceOf[ArrayData], q.asInstanceOf[Double])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QhistQuantileUb =
    copy(left = newLeft, right = newRight)
}
