package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Single-pass L2 unit-normalize of a numeric embedding array:
  * u_i = round(x_i / √Σx², 9), NULL when the vector is empty, has a
  * NULL element, or has zero (or NaN) squared norm — exactly the rows
  * the declarative `aggregate(...) > 0` prefilter it replaces dropped.
  *
  * Bit-identical to the HOF pipeline it replaces in
  * Similarity.embedIsotropy (`transform(e, x -> round(x / sqrt(
  * aggregate(e, 0.0, (a,x) -> a + x*x)), 9))`): the squared norm is the
  * same left-to-right double fold over the elements in array order,
  * √ is the same Math.sqrt, and the 9-dp round replicates Spark's
  * Round-on-double semantics (NaN/Inf pass through; otherwise
  * BigDecimal.valueOf(v).setScale(9, HALF_UP)). The expression exists
  * because the HOF form re-evaluated the O(dims) norm fold inside the
  * per-element transform lambda — O(dims²) interpreted work per row
  * (r16 verdict #3); this is one O(dims) pass per row inside
  * whole-stage codegen. */
case class UnitNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_unit_norm expects array<float> or array<double>, " +
        s"got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  private lazy val isFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(arr: Any): Any =
    UnitNormalize.compute(arr.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.UnitNormalize.compute($c, $isFloat);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnitNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_unit_norm"
}

object UnitNormalize {

  /** Spark Round(v, 9) semantics for doubles: NaN/Inf pass through,
    * otherwise decimal HALF_UP at scale 9. */
  private def round9(v: Double): Double =
    if (java.lang.Double.isNaN(v) || java.lang.Double.isInfinite(v)) v
    else java.math.BigDecimal.valueOf(v)
      .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(arr: ArrayData, isFloat: Boolean): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      acc += x * x
      i += 1
    }
    if (!(acc > 0)) return null
    val nrm = java.lang.Math.sqrt(acc)
    val out = new Array[Any](n)
    i = 0
    while (i < n) {
      val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      out(i) = round9(x / nrm)
      i += 1
    }
    new GenericArrayData(out)
  }
}
