package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Jaccard similarity of two SORTED, DISTINCT string arrays in one
  * merge pass: |A ∩ B| / |A ∪ B| with a classic two-pointer walk — no
  * intermediate arrays, no hash set, no per-element lambda, and codegen
  * emits a single static call so the surrounding whole-stage span stays
  * intact. The declarative twin
  * (size(array_intersect)/size(array_union)) allocates both arrays and
  * hashes every element; the pair-verification hot path of a banded
  * near-dup join calls this once per candidate pair, which is exactly
  * where those allocations hurt.
  *
  * The sorted-distinct precondition is the caller's (sort_array over a
  * distinct set — what [[graft.operators.Dedup]] verification frames
  * already hold); unsorted input would silently undercount the
  * intersection and duplicates would inflate na+nb, so eval pre-scans
  * BOTH arrays for STRICTLY ascending order (equal adjacent elements =
  * duplicates are rejected too) and fails loudly on violation. NULL
  * elements are likewise rejected — graft_jaccard is registered as a
  * general SQL function, so arbitrary user arrays reach this path and
  * must error, not NPE. (The merge alone can't see descents past a
  * stalled pointer; the pre-scan is O(n) like the merge itself, two
  * comparisons per element, no allocation.)
  */
case class SortedArrayJaccard(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isStrArr(t: DataType): Boolean = t match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isStrArr(left.dataType) && isStrArr(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_jaccard expects (array<string>, array<string>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    SortedArrayJaccard.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (l, r) => s"graft.functions.SortedArrayJaccard.compute($l, $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedArrayJaccard =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_jaccard"
}

object SortedArrayJaccard {

  private def assertAscending(a: ArrayData, n: Int): Unit = {
    if (n > 0 && a.isNullAt(0))
      throw new IllegalArgumentException(
        "graft_jaccard requires non-null array elements; got NULL")
    var i = 1
    while (i < n) {
      if (a.isNullAt(i))
        throw new IllegalArgumentException(
          "graft_jaccard requires non-null array elements; got NULL")
      val c = a.getUTF8String(i).compareTo(a.getUTF8String(i - 1))
      if (c < 0)
        throw new IllegalArgumentException(
          "graft_jaccard requires SORTED arrays; got descending elements")
      if (c == 0)
        throw new IllegalArgumentException(
          "graft_jaccard requires DISTINCT arrays; got duplicate elements")
      i += 1
    }
  }

  /** Two-pointer sorted-merge intersection count; empty ∪ empty = 0.0. */
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    assertAscending(a, na)
    assertAscending(b, nb)
    var i = 0
    var j = 0
    var inter = 0L
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }
}
