package graft.functions

import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass 32-bit SimHash fingerprint of a token array — the native
  * replacement for the declarative shape in Dedup.simhashDetPairs
  * (explode(toks) → 32 conditional-sum aggregate columns → bit
  * reassembly), which pays a corpus-sized explode plus a 32-column
  * aggregate per document. This is one static call per document inside
  * whole-stage codegen: iterate the array once, bump 32 counters off the
  * md5-derived token hash, emit the sign-bit fingerprint.
  *
  * BIT-IDENTICAL to the declarative twin (DedupSpec pins raw equality):
  * h(token) = first 8 md5 hex chars as an unsigned 32-bit value (exactly
  * `conv(substring(md5(t),1,8),16,10)`); counter k takes +1 when bit k of
  * h is set else −1, duplicates counted; fingerprint bit k set iff
  * counter k > 0. A NULL array element contributes −1 to every counter —
  * the same thing the declarative `when(...).otherwise(-1)` did under a
  * null hash. The per-token hash memoizes (token → h) with a bounded
  * entry budget (ints, so the cap is comfortably memory-safe), degrading
  * to recompute — never OOM — under an adversarial vocabulary. */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    SimHash32.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash32.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash"
}

object SimHash32 {
  // entries are (UTF8String, boxed Int): a 2^22 cap bounds the memo at
  // tens of MB; past it the function recomputes md5 per occurrence
  private final val MaxMemo = 1 << 22
  private val memo = new ConcurrentHashMap[UTF8String, Integer]()

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Unsigned 32-bit value of the first 8 md5 hex chars of `token` —
    * the first 4 digest bytes, big-endian. */
  private def h32(token: UTF8String): Int = {
    val cached = memo.get(token)
    if (cached != null) return cached.intValue()
    val md = md5Local.get()
    md.reset()
    val d = md.digest(token.getBytes)
    val h = ((d(0) & 0xff) << 24) | ((d(1) & 0xff) << 16) |
      ((d(2) & 0xff) << 8) | (d(3) & 0xff)
    if (memo.size() < MaxMemo) memo.put(token.clone(), Integer.valueOf(h))
    h
  }

  def compute(tokens: ArrayData): Long = {
    val n = tokens.numElements()
    val counts = new Array[Int](32)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t == null) {
        // declarative twin: a null hash falls into every bit's -1 branch
        var k = 0
        while (k < 32) { counts(k) -= 1; k += 1 }
      } else {
        val h = h32(t)
        var k = 0
        while (k < 32) {
          if (((h >>> k) & 1) == 1) counts(k) += 1 else counts(k) -= 1
          k += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var k = 0
    while (k < 32) {
      if (counts(k) > 0) fp |= (1L << k)
      k += 1
    }
    fp
  }
}
