package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Packed HyperLogLog register vectors as a single BINARY column — the
  * shuffle-shape fix for register propagation at scale. The row-per-
  * register HLL frame ([[graft.ops.Sketches.hllRegisters]]) is the right
  * shape for ORACLE-EXACT per-register SQL, but propagating it along
  * graph edges (HyperANF) multiplies every edge row by the registers it
  * carries — an |E|·m-row shuffle. Packing the m registers into one
  * m-byte payload makes each edge carry ONE fixed-width row, and the
  * bytewise-max aggregate is partial-aggregable (map-side combine
  * reduces each partition to its distinct node ids BEFORE the exchange)
  * — the true HyperANF cost model: O(|E|) rows of O(m) bytes per hop.
  *
  * The register VALUES are bit-identical to the row form (same md5 hash,
  * same bucket/rho split), so [[HllCard]]'s (n_registers, sum_scaled)
  * equals the row-form aggregation and the DuckDB oracle — which rebuilds
  * the row form in SQL — still matches hash-exactly.
  */
object SketchFunctions {
  /** Elementwise max of two register arrays; empty = identity. Mutates
    * and returns `a` when owned by the caller (aggregation buffers are
    * caller-owned in TypedImperativeAggregate).
    */
  def maxInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    if (a.isEmpty) return b.clone()
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"register width mismatch: ${a.length} vs ${b.length}")
    var i = 0
    while (i < a.length) {
      // rho values are small positives; unsigned compare for safety
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }
}

/** `graft_hllinit(bucket, rho, m)`: an m-byte register vector with
  * `rho` written at index `bucket`, zeros elsewhere — one value's HLL
  * contribution, ready for [[HllMaxAgg]] merging.
  */
case class HllInit(bucket: Expression, rho: Expression, m: Int)
  extends BinaryExpression with CodegenFallback {

  require(m >= 2 && Integer.bitCount(m) == 1,
    s"register count must be a power of two, got $m")

  override def left: Expression = bucket
  override def right: Expression = rho
  override def dataType: DataType = BinaryType

  override protected def nullSafeEval(b: Any, r: Any): Any = {
    val arr = new Array[Byte](m)
    val idx = b.asInstanceOf[Number].intValue()
    require(idx >= 0 && idx < m, s"bucket $idx out of [0, $m)")
    arr(idx) = r.asInstanceOf[Number].byteValue()
    arr
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(bucket = newLeft, rho = newRight)
}

/** `graft_hllmax(regs)`: aggregate merging register vectors by
  * elementwise max — associative, commutative, partial-aggregable, so
  * the exchange sees one row per (group, partition), never per input
  * row. NULL/empty inputs are identity; an all-null group yields NULL.
  */
case class HllMaxAgg(child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buffer
    else SketchFunctions.maxInto(buffer, v.asInstanceOf[Array[Byte]])
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] =
    SketchFunctions.maxInto(buffer, other)

  override def eval(buffer: Array[Byte]): Any =
    if (buffer.isEmpty) null else buffer

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

/** `graft_hllcard(regs)`: the engine-exact estimate precursors from a
  * packed register vector — `n_registers` (non-empty count) and
  * `sum_scaled` = Σ_j 2^(maxRho − rho_j) with empty registers
  * contributing 2^maxRho, where maxRho = 61 − log2(m) (the 60-bit
  * md5-prefix hash split). Identical integers to the row-form
  * aggregation in [[graft.ops.Sketches.hllEstimate]].
  */
case class HllCard(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_registers", LongType, nullable = false),
    StructField("sum_scaled", LongType, nullable = false)))

  override protected def nullSafeEval(input: Any): Any = {
    val regs = input.asInstanceOf[Array[Byte]]
    val m = regs.length
    require(m >= 2 && Integer.bitCount(m) == 1,
      s"register count must be a power of two, got $m")
    val maxRho = 61 - Integer.numberOfTrailingZeros(m)
    var n = 0L
    var s = 0L
    var i = 0
    while (i < m) {
      val r = regs(i) & 0xff
      if (r > 0) n += 1
      s += 1L << (maxRho - r)
      i += 1
    }
    InternalRow(n, s)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
