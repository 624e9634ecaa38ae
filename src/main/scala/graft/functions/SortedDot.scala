package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Sparse dot product over two TOKEN-SORTED (token string, weight
  * double) entry arrays: one merge scan, summing a.weight · b.weight
  * for matched tokens in ascending token order.
  *
  * Bit-identical to the declarative per-pair fold it replaces in
  * Similarity.scorePairs (fold over a's entries in token order, each
  * term a.w · coalesce(b[token], 0.0)): an unmatched entry contributed
  * an exact ±0.0 — an IEEE no-op on the running sum — so summing only
  * the matched terms in the same order yields the same double, bit for
  * bit, and therefore the same DuckDB-oracle parity. The expression
  * exists because the fold ran as interpreted HOF lambdas with a
  * per-entry hash-map probe per element; this is one static call per
  * pair inside whole-stage codegen (the graft_cosine lesson: the
  * measured 5.2-5.7× native-vs-HOF gap on exactly this per-pair
  * scoring tier). */
case class SortedDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def okType(dt: DataType): Boolean = dt match {
    case ArrayType(StructType(Array(f0, f1)), _) =>
      f0.dataType == StringType && f1.dataType == DoubleType
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (okType(left.dataType) && okType(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_sorted_dot expects two array<struct<string,double>> inputs, " +
        s"got ${left.dataType.simpleString} and ${right.dataType.simpleString}")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedDot.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_sorted_dot"
}

object SortedDot {
  def compute(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var sum = 0.0
    while (i < na && j < nb) {
      val ea = a.getStruct(i, 2)
      val eb = b.getStruct(j, 2)
      val cmp = ea.getUTF8String(0).compareTo(eb.getUTF8String(0))
      if (cmp == 0) {
        sum += ea.getDouble(1) * eb.getDouble(1)
        i += 1; j += 1
      } else if (cmp < 0) i += 1
      else j += 1
    }
    sum
  }
}
