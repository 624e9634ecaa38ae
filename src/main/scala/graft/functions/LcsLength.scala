package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Longest-common-subsequence length over two TOKEN arrays — the core
  * of ROUGE-L. Classic O(n·m) two-row DP in one static call per pair
  * (token-level LCS has no built-in on either engine; the DuckDB
  * oracle walks the identical recurrence as a recursive-CTE row sweep
  * with the prefix-max reformulation — see Oracles "rouge_l_pairs").
  * Exact integers end to end; argument order is irrelevant
  * (LCS is symmetric), and the shorter array is used as the DP row so
  * memory is min(n, m)+1 ints. */
case class LcsLength(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lcs_len expects two array<string> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    LcsLength.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.LcsLength.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LcsLength =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_lcs_len"
}

object LcsLength {
  def compute(a0: ArrayData, b0: ArrayData): Long = {
    // row over the shorter side
    val (a, b) = if (a0.numElements() >= b0.numElements()) (a0, b0) else (b0, a0)
    val n = a.numElements()
    val m = b.numElements()
    if (m == 0) return 0L
    val row = new Array[Int](m + 1)
    var i = 0
    while (i < n) {
      val ai = a.getUTF8String(i)
      var prevDiag = 0 // dp[i-1][j-1]
      var j = 1
      while (j <= m) {
        val up = row(j) // dp[i-1][j]
        val cand =
          if (ai != null && ai.equals(b.getUTF8String(j - 1))) prevDiag + 1
          else math.max(up, row(j - 1))
        prevDiag = up
        row(j) = cand
        j += 1
      }
      i += 1
    }
    row(m).toLong
  }
}
