package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Buffer of [[HeavyHitters]]: bounded counter map + how much weight the
  * decrement steps have discarded (the error bound of every estimate). */
case class MGSketch(counters: Map[String, Long], discarded: Long)

/** Misra-Gries heavy hitters as a typed `Aggregator` (B87): at most
  * `capacity` counters survive in the buffer at any moment, so state is
  * BOUNDED regardless of cardinality — the frequent-items sketch that
  * finds every item with true count > n/(capacity+1) at any data size,
  * where an exact groupBy would shuffle the full key space.
  *
  * Classic guarantees, preserved across the distributed merge:
  * estimate(x) <= true(x) <= estimate(x) + discarded, and `discarded`
  * <= n/(capacity+1). The merge adds counter maps then applies the same
  * decrement-by-(capacity+1-th largest) compaction (Agarwal et al.'s
  * mergeable-summaries construction), so partial sketches combine under
  * ANY partitioning — what a custom aggregate must guarantee to be
  * safe at cluster scale. Estimates are order-dependent (which items
  * hold counters mid-stream depends on arrival order), so this is a
  * rows+test operator: ScalaTest pins the guarantees against exact
  * counts; no DuckDB twin exists.
  */
class HeavyHitters(capacity: Int = 8)
    extends Aggregator[String, MGSketch, MGSketch] {

  private def compact(m: Map[String, Long], discarded: Long): MGSketch =
    if (m.size <= capacity) MGSketch(m, discarded)
    else {
      // decrement everything by the (capacity+1)-th largest count: at
      // least one counter reaches zero, and the MG error accounting
      // charges the decrement to `discarded` once per removed unit
      val dec = m.values.toSeq.sorted(Ordering[Long].reverse)(capacity)
      val kept = m.map { case (k, v) => k -> (v - dec) }.filter(_._2 > 0L)
      MGSketch(kept, discarded + dec)
    }

  override def zero: MGSketch = MGSketch(Map.empty, 0L)

  override def reduce(b: MGSketch, x: String): MGSketch =
    compact(b.counters.updated(x, b.counters.getOrElse(x, 0L) + 1L), b.discarded)

  override def merge(a: MGSketch, b: MGSketch): MGSketch = {
    val sum = b.counters.foldLeft(a.counters) { case (m, (k, v)) =>
      m.updated(k, m.getOrElse(k, 0L) + v)
    }
    compact(sum, a.discarded + b.discarded)
  }

  override def finish(b: MGSketch): MGSketch = b

  override def bufferEncoder: Encoder[MGSketch] = Encoders.product[MGSketch]
  override def outputEncoder: Encoder[MGSketch] = Encoders.product[MGSketch]
}
