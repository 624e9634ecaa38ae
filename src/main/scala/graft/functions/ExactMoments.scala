package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer/result of [[ExactMoments]]: integer power sums. */
case class Moments(n: Long, sum: Long, sumSq: Long)

/** Typed UDAF (C43): exact integer moments (count, sum, sum of squares)
  * as an `Aggregator` — the third extension tier after native
  * expressions and whole-operator plans. All-long arithmetic makes the
  * merge commutative and associative EXACTLY, so results are identical
  * under any partitioning or merge order — the property a custom
  * aggregate must have to be safe at cluster scale (a double-summing
  * UDAF is not, which is why mean/variance are derived AFTERWARDS from
  * the exact buffer, not accumulated as doubles).
  *
  * Long overflow bound: sumSq grows as n·max². 2^63 accommodates e.g.
  * 10^12 rows of values up to ~3M — beyond that, split the domain or
  * widen the buffer to two longs (hi/lo).
  */
object ExactMoments extends Aggregator[Long, Moments, Moments] {
  override def zero: Moments = Moments(0L, 0L, 0L)
  override def reduce(b: Moments, x: Long): Moments =
    Moments(b.n + 1, b.sum + x, b.sumSq + x * x)
  override def merge(a: Moments, b: Moments): Moments =
    Moments(a.n + b.n, a.sum + b.sum, a.sumSq + b.sumSq)
  override def finish(b: Moments): Moments = b
  override def bufferEncoder: Encoder[Moments] = Encoders.product[Moments]
  override def outputEncoder: Encoder[Moments] = Encoders.product[Moments]
}
