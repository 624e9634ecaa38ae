package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest
import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exponential-race weighted-MinHash signature over a document's token
  * array: for each hash h in [0, numHashes), the winner is the token
  * type minimizing round9(−ln(u_{h,token}) / tf(token)), where
  * u = (md5_24bit(h ":" token) + 1) / 2^24 — bit-identical to the
  * declarative race frame it replaces (Dedup.wminhashSigArr's former
  * explode → vocab×H prior join → per-(doc, h) min-struct → collect
  * shape, itself pinned against the DuckDB oracle at
  * Oracles "dedup_wminhash"): the 24-bit md5 prefix is an exact binary
  * fraction, the race priority rounds HALF_UP at 9 dp exactly as
  * Spark's round(col, 9) does, and ties break on the token's binary
  * UTF8 order, the same total order min(struct(p, token)) used.
  *
  * Why an Expression: the race frame was the repo's single slowest
  * bench floor (tokens×H rows shuffled through two aggregations). Here
  * the whole race runs in one narrow pass per document — tf counted
  * in-place, all H races advanced per token type — so signature
  * computation needs ZERO shuffles and stays inside whole-stage codegen
  * as a single static call. The (h, token) race prior depends only on
  * the token TYPE, so a per-JVM vocabulary-bounded memo (capped;
  * overflow just recomputes) plays the role the former vocab×H prior
  * join played, without the join: at 100 TB, corpus×H ≫ vocab×H still,
  * but now the vocab×H work is a warm cache hit instead of a shuffled
  * broadcast. */
case class WeightedMinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  require(numHashes >= 1 && numHashes <= 1024, "numHashes must be in [1, 1024]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_wminhash_sig expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    WeightedMinHashSig.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.WeightedMinHashSig.compute($c, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): WeightedMinHashSig =
    copy(child = newChild)

  override def prettyName: String = "graft_wminhash_sig"
}

object WeightedMinHashSig {
  /** token -> per-hash −ln(u) priors (length ≥ the requested H). Keyed
    * on the token alone: u depends only on (h, token), so one array per
    * vocabulary entry serves every document on the executor. Bounded so
    * an adversarial unbounded vocabulary degrades to recompute-per-doc
    * instead of OOM. */
  // The budget bounds RETAINED DOUBLES, not entries: each entry holds
  // numHashes doubles (up to 1024 allowed), so a fixed entry cap would
  // retain up to ~8 GB per executor JVM at high H. 2^23 doubles = 64 MB
  // worst case; at the default H=16 that still memoizes ~512k tokens.
  private final val MaxMemoDoubles = 1L << 23
  private val memoDoubles = new java.util.concurrent.atomic.AtomicLong(0L)
  private val memo = new ConcurrentHashMap[UTF8String, Array[Double]]()

  private val md5Local = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** −ln((v+1)/2^24) for v = first 24 md5 bits of "h:token". */
  private def nluArray(token: UTF8String, h: Int): Array[Double] = {
    val md = md5Local.get()
    val out = new Array[Double](h)
    val tokenBytes = token.getBytes
    var i = 0
    while (i < h) {
      md.reset()
      md.update(java.lang.Integer.toString(i).getBytes("UTF-8"))
      md.update(':'.toByte)
      md.update(tokenBytes)
      val d = md.digest()
      val v = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
      out(i) = -math.log((v + 1).toDouble / 16777216.0)
      i += 1
    }
    out
  }

  private def nluFor(token: UTF8String, h: Int): Array[Double] = {
    val cached = memo.get(token)
    if (cached != null && cached.length >= h) return cached
    val fresh = nluArray(token, h)
    // reserve-then-store keeps the retained-bytes bound exact even under
    // concurrent puts; a replaced shorter array's doubles are released.
    // Past the budget the function degrades to recompute-per-doc, not OOM.
    if (memoDoubles.addAndGet(h.toLong) <= MaxMemoDoubles) {
      val prev = memo.put(token.clone(), fresh)
      if (prev != null) memoDoubles.addAndGet(-prev.length.toLong)
    } else {
      memoDoubles.addAndGet(-h.toLong)
    }
    fresh
  }

  /** Spark round(col, 9) on DoubleType: BigDecimal HALF_UP at scale 9. */
  @inline private def round9(d: Double): Double =
    JBigDecimal.valueOf(d).setScale(9, RoundingMode.HALF_UP).doubleValue()

  def compute(tokens: ArrayData, numHashes: Int): ArrayData = {
    val n = tokens.numElements()
    // tf per token type
    val tf = new java.util.HashMap[UTF8String, Int](math.max(16, n * 2))
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      if (t != null) tf.merge(t, 1, (a, b) => a + b)
      i += 1
    }
    if (tf.isEmpty) return new GenericArrayData(Array.empty[Any])
    val bestP = new Array[Double](numHashes)
    val bestTok = new Array[UTF8String](numHashes)
    java.util.Arrays.fill(bestP, Double.PositiveInfinity)
    val it = tf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val token = e.getKey
      val tfc = e.getValue
      val nlus = nluFor(token, numHashes)
      var h = 0
      while (h < numHashes) {
        val p = round9(nlus(h) / tfc)
        if (p < bestP(h) ||
            (p == bestP(h) && (bestTok(h) == null || token.compareTo(bestTok(h)) < 0))) {
          bestP(h) = p
          bestTok(h) = token
        }
        h += 1
      }
    }
    // the consumer treats the signature as immutable row data: copy the
    // UTF8Strings out of whatever buffer the input ArrayData points into
    val sig = new Array[Any](numHashes)
    var h = 0
    while (h < numHashes) { sig(h) = bestTok(h).clone(); h += 1 }
    new GenericArrayData(sig)
  }
}
