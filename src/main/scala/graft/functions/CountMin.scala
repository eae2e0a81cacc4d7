package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types._

/** Count-Min sketch — the engine's mergeable frequency-estimation
  * primitive for heavy-hitter detection at 100 TB scale, where an exact
  * per-value `count(*)` group-by would shuffle every distinct value
  * (Cormode & Muthukrishnan, "An Improved Data Stream Summary: The
  * Count-Min Sketch and its Applications", J. Algorithms 2005).
  *
  * `depth` independent hash rows of `width` counters; each input
  * increments one counter per row (bucket = `mix64(v xor rowSeed) >>> 1
  * mod width`), and the estimate for a value is the MINIMUM of its
  * `depth` counters — an upper bound on the true count that is exact
  * when no collision hits all rows, and within `2n/width` with
  * probability `1 - 2^-depth` otherwise. Counter increments are plain
  * sums, so the sketch is COMMUTATIVE and merge-order independent:
  * map-side partial aggregation works, streaming state merges exactly,
  * and the counters are bit-deterministic on any engine that
  * reproduces the integer bucket math (the DuckDB oracle does, in
  * HUGEINT mod-2^64 arithmetic).
  *
  * Compare Spark's `count_min_sketch` built-in: it hashes with
  * Murmur3-128 via a Guava-layout binary blob — not externally
  * replicable, and its estimate cannot sit behind a bit-exact
  * correctness gate. This sketch uses the engine-wide splitmix64
  * kernel ([[Hashing.mix64]]) end to end.
  *
  * Memory: `depth * width` longs per group in the aggregation buffer
  * (4×1024 → 32 KiB) — sized for coarse group-bys (per segment/type/
  * day), not per-user cardinalities.
  */
object CountMin {

  val DefaultDepth = 4
  val DefaultWidth = 1024

  /** Row-j hash seed — same prime family as the minhash permutations. */
  @inline def seedOf(j: Int): Long = j.toLong * 0xC2B2AE3D27D4EB4FL

  /** Counter index (within row j) of value `v`. */
  @inline def bucketOf(v: Long, j: Int, width: Int): Int =
    ((Hashing.mix64(v ^ seedOf(j)) >>> 1) % width).toInt

  /** [[estimateOf]] from the columnar array form, validating shape —
    * the eval/codegen entry point of [[CmEstimate]].
    */
  def estimateChecked(counts: ArrayData, depth: Int, v: Long): Long = {
    val arr = counts.toLongArray()
    require(arr.length % depth == 0,
      s"graft_cm_estimate: counter array length ${arr.length} is not a " +
        s"multiple of depth $depth")
    estimateOf(arr, depth, v)
  }

  /** Point estimate: min over rows of the value's counter. */
  def estimateOf(counts: Array[Long], depth: Int, v: Long): Long = {
    val width = counts.length / depth
    var est = Long.MaxValue
    var j = 0
    while (j < depth) {
      val c = counts(j * width + bucketOf(v, j, width))
      if (c < est) est = c
      j += 1
    }
    est
  }

  /** Aggregate: flat `depth*width` counter array (`array<long>`, row-
    * major) over a long column. Hashing happens inside the aggregate.
    */
  def sketch(value: Column, depth: Int = DefaultDepth,
      width: Int = DefaultWidth): Column =
    GraftSqlBridge.column(
      CountMinAgg(GraftSqlBridge.expression(value), depth, width)
        .toAggregateExpression())

  /** Scalar: frequency estimate of `value` from a [[sketch]] array
    * built with the same `depth`.
    */
  def estimate(counts: Column, value: Column,
      depth: Int = DefaultDepth): Column =
    GraftSqlBridge.column(CmEstimate(
      GraftSqlBridge.expression(counts),
      GraftSqlBridge.expression(value), depth))
}

/** `graft_cm(longCol[, depth, width])` — see [[CountMin]]. Buffer =
  * dense long[depth*width]; serialized as 8-byte big-endian longs for
  * the partial exchange.
  */
case class CountMinAgg(child: Expression,
    depth: Int = CountMin.DefaultDepth,
    width: Int = CountMin.DefaultWidth,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression]
    with ImplicitCastInputTypes {

  require(depth >= 1 && depth <= 16,
    s"graft_cm depth must be in [1, 16], got $depth")
  require(width >= 2 && width <= (1 << 20),
    s"graft_cm width must be in [2, 2^20], got $width")

  override def inputTypes: Seq[DataType] = Seq(LongType)

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long]
      var j = 0
      while (j < depth) {
        buf(j * width + CountMin.bucketOf(x, j, width)) += 1L
        j += 1
      }
    }
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
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
}

/** `graft_cm_estimate(counts, value[, depth])` — min-over-rows frequency
  * estimate from a [[CountMinAgg]] counter array.
  */
case class CmEstimate(left: Expression, right: Expression,
    depth: Int = CountMin.DefaultDepth) extends BinaryExpression
    with ImplicitCastInputTypes {

  require(depth >= 1 && depth <= 16,
    s"graft_cm_estimate depth must be in [1, 16], got $depth")

  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), LongType)

  override def dataType: DataType = LongType

  override def nullSafeEval(counts: Any, value: Any): Any =
    CountMin.estimateChecked(counts.asInstanceOf[ArrayData], depth,
      value.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, v) =>
      s"graft.functions.CountMin.estimateChecked($c, $depth, $v)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmEstimate =
    copy(left = newLeft, right = newRight)
}
