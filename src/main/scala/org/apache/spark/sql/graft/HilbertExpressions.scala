package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert curve key — the stronger sibling of the Morton key in
  * [[ZorderExpressions]]: consecutive curve positions are always
  * 4-adjacent grid neighbors (Morton jumps across quadrant seams), so
  * range-partitioning the key yields tiles with strictly better
  * worst-case locality — the reason Delta Lake added HILBERT alongside
  * ZORDER for liquid clustering. Hilbert (1891); xy→d via the
  * bit-descent + quadrant-rotation algorithm (Warren, Hacker's
  * Delight §16-1 form).
  */
object HilbertKernels {

  /** Curve order fixed at 16: cell indices must be < 2^16, keys are
    * < 2^32. Grid cell indices (not raw coordinates) are the intended
    * input, exactly as for Morton.
    */
  val Order = 16

  /** Map cell (y, x) to its distance along the order-16 Hilbert curve.
    * Bit descent from the top: accumulate the quadrant index
    * (3*rx XOR ry) at each scale, then reflect/transpose the lower
    * bits into the quadrant's frame.
    */
  def xy2d(y: Long, x: Long): Long = {
    require(x >= 0 && x < (1L << Order) && y >= 0 && y < (1L << Order),
      s"cell indices must be in [0, 2^$Order), got ($y, $x)")
    var xx = x
    var yy = y
    var d = 0L
    var s = 1L << (Order - 1)
    while (s > 0) {
      val rx = if ((xx & s) > 0) 1L else 0L
      val ry = if ((yy & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) {
          xx = s - 1 - xx
          yy = s - 1 - yy
        }
        val t = xx; xx = yy; yy = t
      }
      s >>= 1
    }
    d
  }
}

/** `hilbert_key(y, x)` — codegen expression form of
  * [[HilbertKernels.xy2d]], mirroring [[InterleaveBits]].
  */
case class HilbertKey(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"
  override protected def nullSafeEval(y: Any, x: Any): Any =
    HilbertKernels.xy2d(y.asInstanceOf[Long], x.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (y, x) =>
      s"org.apache.spark.sql.graft.HilbertKernels.xy2d($y, $x)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
