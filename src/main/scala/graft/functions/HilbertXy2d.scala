package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Native Hilbert-curve index: `hilbert_xy2d(x, y)` for an `order`-bit
  * grid — the space-filling curve whose consecutive indices are ALWAYS
  * grid-adjacent (Manhattan step exactly 1 on a full grid), unlike the
  * Morton/Z key ([[graft.ext.Layout.mortonKey]]) whose bit-boundary jumps
  * span half the grid. Better adjacency = tighter per-file rectangles =
  * more parquet min/max pruning at the same file count; this expression is
  * the write-side sort key for that layout (the Delta/Iceberg
  * OPTIMIZE-by-Hilbert design).
  *
  * The transform is the classical reflect-rotate recurrence (Hilbert 1891;
  * the xy2d loop popularized by Warren's Hacker's Delight): per bit plane
  * s = 2^(order−1)..1, quadrant digit (3·rx) XOR ry appends s², then the
  * frame reflects/swaps. Pure integer ops on exact longs — the DuckDB
  * oracle replays the identical per-plane algebra as a chained-CTE unroll.
  */
case class HilbertXy2d(left: Expression, right: Expression, order: Int)
  extends BinaryExpression {
  require(order >= 1 && order <= 31, s"order must be 1..31, got $order")

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_xy2d"

  override def nullSafeEval(a: Any, b: Any): Any =
    HilbertXy2d.compute(a.asInstanceOf[Long], b.asInstanceOf[Long], order)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.HilbertXy2d.compute($a, $b, $order)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression)
      : HilbertXy2d = copy(left = newLeft, right = newRight)
}

object HilbertXy2d {

  /** Static kernel shared by interpreted eval and generated code. Inputs
    * must lie in [0, 2^order); out-of-range coordinates raise rather than
    * silently aliasing onto another cell.
    */
  def compute(x0: Long, y0: Long, order: Int): Long = {
    val n = 1L << order
    if (x0 < 0 || y0 < 0 || x0 >= n || y0 >= n)
      throw new IllegalArgumentException(
        s"hilbert_xy2d: ($x0, $y0) outside [0, $n) grid")
    var x = x0
    var y = y0
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  def hilbertXy2d(x: Column, y: Column, order: Int): Column =
    ColumnBridge.column(HilbertXy2d(
      ColumnBridge.expression(x), ColumnBridge.expression(y), order))
}
