package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass token n-gram shingle hashing over a whitespace-separated
  * string: tokenize, xxhash64 each token span in place (seed 42 — the
  * same as functions.xxhash64), combine each n-window with
  * `(h << 13) ^ (h >> 7) ^ next`, emit first-occurrence-distinct hashes.
  *
  * Bit-identical to the declarative form (split → filter → transform
  * xxhash64 → shifted-slice zips → array_distinct, see
  * Dedup.shinglesDeclarative) but one pass, zero intermediate arrays, and
  * no per-element lambda interpretation. Codegen emits a single static
  * call, keeping the surrounding whole-stage-codegen span intact.
  */
case class NGramShingleHash(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1, "n must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngram_shingle_hash expects a string input, got ${child.dataType.simpleString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    NGramShingleHash.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.NGramShingleHash.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): NGramShingleHash =
    copy(child = newChild)

  override def prettyName: String = "ngram_shingle_hash"
}

object NGramShingleHash {
  private final val Seed = 42L

  /** One pass: token spans -> xxh64 -> rolling n-window combine ->
    * first-occurrence distinct. */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // token hashes
    val tokenHashes = new scala.collection.mutable.ArrayBuffer[Long](64)
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' ') {
        if (i > start) {
          tokenHashes += XXH64.hashUnsafeBytes(
            bytes, Platform.BYTE_ARRAY_OFFSET + start, i - start, Seed)
        }
        start = i + 1
      }
      i += 1
    }
    val m = tokenHashes.length - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j < m) {
      var h = tokenHashes(j)
      var w = 1
      while (w < n) {
        h = (h << 13) ^ (h >> 7) ^ tokenHashes(j + w)
        w += 1
      }
      seen.add(h)
      j += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}
