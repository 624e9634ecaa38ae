package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode canonicalization for corpus normalization: NFD-decompose,
  * drop combining marks (accents), NFC-recompose — the same visible
  * result as DuckDB's `strip_accents(nfc_normalize(x))`, which the
  * oracle uses as the independent twin.
  *
  * Native Expression rather than a UDF so the surrounding whole-stage
  * codegen span stays intact (a Scala UDF forces a deserialize /
  * serialize boundary per row). The hot path is the pure-ASCII check:
  * one branchless byte scan, and ASCII input — the overwhelming case in
  * a web corpus after language filtering — returns the SAME UTF8String
  * with zero allocation; only rows that actually carry non-ASCII pay
  * the java.text.Normalizer round-trip.
  */
case class UnicodeNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_normalize expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UnicodeNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): UnicodeNormalize =
    copy(child = newChild)

  override def prettyName: String = "graft_normalize"
}

object UnicodeNormalize {

  /** Strips combining marks after NFD, recomposes to NFC. ASCII input
    * short-circuits to the input reference (no copy). */
  def compute(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val decomposed = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(decomposed.length)
    var j = 0
    while (j < decomposed.length) {
      val cp = decomposed.codePointAt(j)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
          t != Character.ENCLOSING_MARK) {
        sb.appendCodePoint(cp)
      }
      j += Character.charCount(cp)
    }
    UTF8String.fromString(Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
  }
}
