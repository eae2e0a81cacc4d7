package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Bloom filter — the engine's compact set-membership primitive for
  * 100 TB-scale "is this in the reference set?" gates (benchmark
  * decontamination, blocklist lookups, seen-before checks) where the
  * reference set fits in MBs but the probed corpus does not (Bloom,
  * "Space/time trade-offs in hash coding with allowable errors",
  * CACM 1970).
  *
  * `k` bit positions per element (`mix64(v xor probeSeed) >>> 1 mod m`);
  * membership = all `k` bits set. Bit sets are idempotent ORs, so the
  * filter is COMMUTATIVE and merge-order independent: map-side partial
  * aggregation works, and the bit array is bit-deterministic on any
  * engine that reproduces the integer position math (the DuckDB oracle
  * does, in HUGEINT mod-2^64 arithmetic) — INCLUDING the false
  * positives, which are a deterministic function of (m, k, input set),
  * not noise.
  *
  * Compare Spark's `BloomFilterAggregate` (`bloom_filter_agg`): it
  * hashes with xxhash64 into a Guava-layout blob — not externally
  * replicable. This filter uses the engine-wide splitmix64 kernel
  * ([[Hashing.mix64]]) end to end, so a correctness gate can replay it.
  *
  * The 100 TB shape: aggregate the SMALL side into one `m/8`-byte row,
  * broadcast it (a 1-row cross join — Catalyst plans a
  * BroadcastNestedLoopJoin of one row), and probe map-side. The big
  * side is touched in one pass with no shuffle; survivors of the
  * bloom gate (a tiny fraction) can then afford an exact verify join.
  */
object Bloom {

  val DefaultBits = 1 << 16 // 8 KiB
  val DefaultK = 3

  /** Probe-i hash seed — offset so probe 0 is not the raw mix64 that
    * other sketches already use on the same values.
    */
  @inline def seedOf(i: Int): Long = (2L * i + 1L) * 0x9E3779B97F4A7C15L

  /** Bit position of probe `i` for value `v`. */
  @inline def posOf(v: Long, i: Int, mBits: Int): Int =
    ((Hashing.mix64(v ^ seedOf(i)) >>> 1) % mBits).toInt

  /** True iff all `k` positions for `v` are set in `bits`. */
  def containsOf(bits: Array[Byte], k: Int, v: Long): Boolean = {
    val m = bits.length * 8
    var i = 0
    while (i < k) {
      val p = posOf(v, i, m)
      if ((bits(p >>> 3) & (1 << (p & 7))) == 0) return false
      i += 1
    }
    true
  }

  /** Aggregate: `mBits`-wide bloom bit array (`binary`, little-endian
    * bit order within each byte) over a long column.
    */
  def agg(value: Column, mBits: Int = DefaultBits, k: Int = DefaultK): Column =
    GraftSqlBridge.column(
      BloomAgg(GraftSqlBridge.expression(value), mBits, k)
        .toAggregateExpression())

  /** Scalar: membership probe against an [[agg]] bit array built with
    * the same `k`.
    */
  def mightContain(bits: Column, value: Column, k: Int = DefaultK): Column =
    GraftSqlBridge.column(BloomMightContain(
      GraftSqlBridge.expression(bits),
      GraftSqlBridge.expression(value), k))
}

/** `graft_bloom(longCol[, mBits, k])` — see [[Bloom]]. Buffer = dense
  * byte[mBits/8]; serialized as-is for the partial exchange.
  */
case class BloomAgg(child: Expression,
    mBits: Int = Bloom.DefaultBits, k: Int = Bloom.DefaultK,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression]
    with ImplicitCastInputTypes {

  require(mBits >= 8 && mBits <= (1 << 28) && mBits % 8 == 0,
    s"graft_bloom mBits must be a multiple of 8 in [8, 2^28], got $mBits")
  require(k >= 1 && k <= 16, s"graft_bloom k must be in [1, 16], got $k")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Byte] =
    new Array[Byte](mBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val p = Bloom.posOf(x, i, mBits)
        buf(p >>> 3) = (buf(p >>> 3) | (1 << (p & 7))).toByte
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) {
      buf(i) = (buf(i) | other(i)).toByte
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomAgg =
    copy(child = newChild)
}

/** `graft_bloom_contains(bits, value[, k])` — all-k-bits-set membership
  * probe of a [[BloomAgg]] bit array.
  */
case class BloomMightContain(left: Expression, right: Expression,
    k: Int = Bloom.DefaultK) extends BinaryExpression
    with ImplicitCastInputTypes {

  require(k >= 1 && k <= 16, s"graft_bloom_contains k must be in [1, 16], got $k")

  override def inputTypes: Seq[DataType] = Seq(BinaryType, LongType)

  override def dataType: DataType = BooleanType

  override def nullSafeEval(bits: Any, value: Any): Any =
    Bloom.containsOf(bits.asInstanceOf[Array[Byte]], k,
      value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, v) =>
      s"graft.functions.Bloom.containsOf($b, $k, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
