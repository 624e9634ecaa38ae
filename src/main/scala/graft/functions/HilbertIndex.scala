package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert-curve index of a 2-D point in [0, 2^31)² — the locality-
  * preserving complement to [[MortonInterleave]]. Where the Morton curve
  * jumps across the plane at every quadrant boundary, the Hilbert curve
  * is continuous: consecutive keys are always adjacent cells, so sorting
  * (or range-partitioning) a table by this key yields strictly tighter
  * per-file min/max envelopes on BOTH dimensions than the z-order — the
  * layout Iceberg/Delta reach for when z-order pruning is not enough.
  *
  * Standard xy→d walk (the public-domain convert-and-rotate algorithm,
  * e.g. Hamilton's compact Hilbert indices / Wikipedia's xy2d): 31
  * levels from the top bit down; at each level the quadrant id (a
  * Gray-coded (rx, ry) pair) contributes s²·((3·rx) XOR ry) and the
  * frame is reflected/transposed so the child quadrant walks in the
  * right orientation. d covers [0, 2^62), always inside a signed long.
  *
  * The domain is enforced, not assumed (the [[MortonInterleave]]
  * discipline): an operand outside [0, 2^31) raises at eval time —
  * failing loudly beats a silently broken layout. The loop is branch-
  * light and allocation-free; codegen emits one static call so the
  * surrounding whole-stage-codegen span stays intact.
  */
case class HilbertIndex(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_hilbert expects (bigint, bigint), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any =
    HilbertIndex.compute(l.asInstanceOf[Long], r.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.HilbertIndex.compute($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_hilbert"
}

object HilbertIndex {

  /** Curve order: coordinates live in [0, 2^ORDER). */
  val Order: Int = 31

  def compute(x0: Long, y0: Long): Long = {
    if (x0 < 0L || x0 >= (1L << Order) || y0 < 0L || y0 >= (1L << Order))
      throw new IllegalArgumentException(
        s"graft_hilbert operands must be in [0, 2^$Order), got ($x0, $y0)")
    val n1 = (1L << Order) - 1L
    var x = x0
    var y = y0
    var d = 0L
    var s = 1L << (Order - 1)
    while (s > 0L) {
      val rx = if ((x & s) > 0L) 1L else 0L
      val ry = if ((y & s) > 0L) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      // rotate the frame so the child quadrant is walked in order; the
      // reflection is a full-width bit-flip (n-1-x ≡ NOT x within Order
      // bits) — only the not-yet-consumed low bits matter downstream,
      // and those are exactly the reflected ones
      if (ry == 0L) {
        if (rx == 1L) {
          x = n1 - x
          y = n1 - y
        }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}
