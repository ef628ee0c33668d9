package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** `graft_hilbert(x, y, bits)`: Hilbert-curve index of the (x, y) cell
  * over a 2^bits × 2^bits grid — the data-layout alternative to
  * [[graft.sources.ZOrder.zValue]] with strictly better locality:
  * consecutive curve positions are ALWAYS Manhattan-adjacent cells (the
  * Z-curve jumps across the grid at power-of-two seams), so
  * range-partitioning on the Hilbert value gives tighter per-file
  * (x, y) bounding boxes and better zone-map pruning for the same one
  * range exchange.
  *
  * The per-level flip/swap state machine rewrites (x, y) at every
  * level, so a column-expression formulation doubles the expression
  * tree per level (2^bits blowup through CollapseProject) — this is
  * exactly the native-Expression case: one tight JVM loop per row,
  * `bits` iterations, pure integer ops, bit-reproducible everywhere.
  * The DuckDB twin unrolls the same rounds as MATERIALIZED CTEs.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression with CodegenFallback {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31]: $bits")

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override protected def nullSafeEval(l: Any, r: Any): Any = {
    val mask = (1L << bits) - 1
    var x = l.asInstanceOf[Long] & mask
    var y = r.asInstanceOf[Long] & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0L) {
        if (rx == 1L) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
