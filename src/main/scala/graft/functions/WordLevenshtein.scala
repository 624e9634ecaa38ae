package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Word-level Levenshtein distance over two TOKEN arrays — the edit
  * core of WER (word error rate, the standard ASR/MT transcript
  * metric; cf. the reference's document-pair comparisons which only
  * ever operate at char level). Substitution, insertion and deletion
  * all cost 1; classic O(n·m) two-row DP like [[LcsLength]], but with
  * the substitution arm LCS lacks. Neither engine has a token-level
  * edit distance built in — DuckDB's `levenshtein` is BYTE-level (a
  * multi-byte codepoint substitution costs its byte length), so no
  * token→string encoding can reproduce token distances; the oracle
  * instead walks the identical recurrence as a recursive-CTE row sweep
  * with the prefix-MIN reformulation (see Oracles.scala `wer_pairs`).
  * Exact integers end to end; symmetric in its arguments; the shorter
  * array is the DP row so memory is min(n, m)+1 ints. */
case class WordLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_word_lev expects two array<string> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    WordLevenshtein.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.WordLevenshtein.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WordLevenshtein =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_word_lev"
}

object WordLevenshtein {
  def compute(a0: ArrayData, b0: ArrayData): Long = {
    // row over the shorter side
    val (a, b) = if (a0.numElements() >= b0.numElements()) (a0, b0) else (b0, a0)
    val n = a.numElements()
    val m = b.numElements()
    if (m == 0) return n.toLong
    val row = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { row(j) = j; j += 1 }
    var i = 1
    while (i <= n) {
      // isNullAt first: UnsafeArrayData.getUTF8String returns an EMPTY
      // string for a null slot (GenericArrayData returns null), so a
      // direct get would make the same logical input distance-diverge
      // by physical representation when called from SQL.
      val ai = if (a.isNullAt(i - 1)) null else a.getUTF8String(i - 1)
      var prevDiag = row(0) // dp[i-1][j-1]
      row(0) = i
      j = 1
      while (j <= m) {
        val up = row(j) // dp[i-1][j]
        val bj = if (b.isNullAt(j - 1)) null else b.getUTF8String(j - 1)
        val eq = if (ai == null) bj == null else ai.equals(bj)
        val cand =
          if (eq) prevDiag
          else 1 + math.min(prevDiag, math.min(up, row(j - 1)))
        prevDiag = up
        row(j) = cand
        j += 1
      }
      i += 1
    }
    row(m).toLong
  }
}
