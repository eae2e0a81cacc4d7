package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** HyperLogLog-style distinct-count sketch — the engine's mergeable
  * approximate-distinct primitive for 100 TB-scale profiling (distinct
  * users per segment, distinct documents per domain) where
  * `count(DISTINCT x)` would shuffle every value.
  *
  * Registers: `m = 2^p` bytes; each input hashes through splitmix64
  * ([[Hashing.mix64]]), the top `p` bits pick a register, and the
  * register keeps the maximum `rho` = 1 + leading-zero count of the
  * remaining `64-p` bits. Register updates are idempotent max-merges,
  * so the sketch is COMMUTATIVE and merge-order independent: map-side
  * partial aggregation works, streaming state merges exactly, and the
  * register array is bit-deterministic on any engine that reproduces
  * the integer bucket math (the DuckDB oracle does, via
  * `57 - length(bin(low_bits))`).
  *
  * Compare Spark's `approx_count_distinct` (HLL++): not externally
  * replicable (xxhash64 + bias tables) and its estimate is not part of
  * a correctness contract. This sketch trades the bias correction
  * tables for exact reproducibility of the REGISTERS; the estimate
  * ([[Hll.estimateOf]]) applies the standard HLL formula with linear
  * counting at the low end — accurate to ~1.04/sqrt(m).
  *
  * Memory: 2^p bytes per group in the aggregation buffer (p=8 → 256 B),
  * exchanged once per partial — sized so even a million-group profile
  * fits comfortably in executor memory.
  */
object Hll {

  /** Register count exponent: m = 2^p registers. */
  val DefaultP = 8

  /** Register index and rho for one hashed input. */
  @inline private[functions] def bucketOf(h: Long, p: Int): Int =
    (h >>> (64 - p)).toInt

  /** rho = 1 + leading zeros of the low (64-p)-bit field; the all-zero
    * field maps to 64-p+1 (the sentinel maximum).
    */
  @inline private[functions] def rhoOf(h: Long, p: Int): Int = {
    val f = 64 - p
    val low = h & ((1L << f) - 1L)
    if (low == 0L) f + 1
    else f + 1 - (64 - java.lang.Long.numberOfLeadingZeros(low))
  }

  /** Standard HLL estimate from a register array: harmonic-mean raw
    * estimate with linear counting below 2.5·m. Returns a rounded Long —
    * an ESTIMATE (library surface), deliberately kept out of
    * exact-parity outputs because the correction branch uses `ln`.
    */
  def estimateOf(regs: Array[Int]): Long = {
    val m = regs.length
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      sum += java.lang.Math.pow(2.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    val raw = alpha * m * m / sum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    math.round(est)
  }

  /** Aggregate: HLL register array (`array<int>`, 2^p entries) of a long
    * column. Hashing (mix64) happens inside the aggregate.
    */
  def sketch(value: Column, p: Int = DefaultP): Column =
    GraftSqlBridge.column(
      HllAgg(GraftSqlBridge.expression(value), p).toAggregateExpression())

  /** Scalar: rounded cardinality estimate out of a [[sketch]] array. */
  def estimate(regs: Column): Column =
    GraftSqlBridge.column(HllEstimate(GraftSqlBridge.expression(regs)))
}

/** `graft_hll(longCol[, p])` — see [[Hll]]. Buffer = dense byte[2^p]
  * (rho ≤ 57 fits a byte); serialized as-is for the partial exchange.
  */
case class HllAgg(child: Expression, p: Int = Hll.DefaultP,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"graft_hll precision p must be in [4, 16], got $p")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hll expects bigint, got ${child.dataType.catalogString}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << p)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Hashing.mix64(v.asInstanceOf[Long])
      val b = Hll.bucketOf(h, p)
      val r = Hll.rhoOf(h, p)
      if (r > buf(b)) buf(b) = r.toByte
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) {
      if (other(i) > buf(i)) buf(i) = other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](buf.length)
    var i = 0
    while (i < buf.length) { out(i) = buf(i).toInt; i += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HllAgg =
    copy(child = newChild)
}

/** `graft_hll_estimate(regs)` — rounded cardinality estimate from a
  * [[HllAgg]] register array.
  */
case class HllEstimate(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hll_estimate expects array<int>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    Hll.estimateOf(input.asInstanceOf[ArrayData].toIntArray())
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Hll.estimateOf($c.toIntArray())")
  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}
