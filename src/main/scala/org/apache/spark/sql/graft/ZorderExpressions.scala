package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) curve key — the storage-layout primitive for
  * multi-dimensional locality. Writing a 100 TB grid table clustered by
  * `interleave_bits(cell_y, cell_x)` gives every parquet file a TIGHT
  * min/max envelope on BOTH axis columns simultaneously, so a bbox
  * filter prunes row groups on y and x together — a row-major layout
  * only ever prunes the outer axis. Cf. the lakehouse OPTIMIZE ZORDER
  * family (Delta/Iceberg); the curve itself is Morton (1966).
  */
object ZorderKernels {
  /** Interleave the low 32 bits of y (odd bit positions) and x (even
    * bit positions) into one 64-bit key. Monotone in each argument when
    * the other is fixed; adjacent cells differ in low bits, so range
    * partitioning the key clusters spatial neighborhoods.
    */
  def interleave(y: Long, x: Long): Long = {
    var out = 0L
    var b = 0
    while (b < 32) {
      out |= ((x >>> b) & 1L) << (2 * b)
      out |= ((y >>> b) & 1L) << (2 * b + 1)
      b += 1
    }
    out
  }
}

case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def prettyName: String = "interleave_bits"
  override protected def nullSafeEval(y: Any, x: Any): Any =
    ZorderKernels.interleave(y.asInstanceOf[Long], x.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (y, x) =>
      s"org.apache.spark.sql.graft.ZorderKernels.interleave($y, $x)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
