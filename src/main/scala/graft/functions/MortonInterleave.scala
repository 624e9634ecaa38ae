package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (z-order) bit interleave of two keys in [0, 2^31) into one
  * 62-bit sort key: bit i of `left` lands at position 2i, bit i of
  * `right` at 2i+1. Sorting (or range-partitioning) a table by this key
  * clusters rows that are close in BOTH dimensions, so min/max file
  * statistics prune scans filtered on either column — the data-layout
  * trick behind Delta/Iceberg Z-ORDER, here as a first-class expression.
  *
  * The domain is enforced, not assumed: an operand outside [0, 2^31)
  * raises at eval time. (Bit 31 of `right` would land on the sign bit
  * of the signed long key, silently sorting the upper half of a 32-bit
  * domain BEFORE the lower half — failing loudly beats a silently
  * broken layout.)
  *
  * The magic-mask spread runs in 5 shift-and-mask steps per operand
  * (no loop, no branch); codegen emits a single static call so the
  * surrounding whole-stage-codegen span stays intact.
  */
case class MortonInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_morton expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any =
    MortonInterleave.compute(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.MortonInterleave.compute($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_morton"
}

object MortonInterleave {

  /** Spread the low 32 bits of v to the even bit positions of a long. */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  def compute(x: Long, y: Long): Long = {
    if (x < 0L || x >= 0x80000000L || y < 0L || y >= 0x80000000L)
      throw new IllegalArgumentException(
        s"graft_morton operands must be in [0, 2^31), got ($x, $y)")
    spread(x) | (spread(y) << 1)
  }
}
