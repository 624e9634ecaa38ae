package graft

import org.apache.spark.sql.functions._
import graft.functions.HeavyHitters
import graft.operators.TextOps

/** Misra-Gries heavy hitters (B87): the classic guarantees, checked
  * against exact counts across a multi-partition shuffle-merge. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish stream: token t_k appears ~ n/k times, shuffled across
  // 8 partitions so reduce AND merge paths both run
  private lazy val stream: Seq[String] =
    (1 to 20).flatMap(k => Seq.fill(2000 / k)(s"t$k"))

  test("estimates never overcount and undercount is bounded by discarded") {
    val ds = spark.createDataset(stream).repartition(8)
    val Array(sk) = ds.select(new HeavyHitters(8).toColumn.name("sk"))
      .select(col("counters"), col("discarded"))
      .as[(Map[String, Long], Long)].collect()
    val (counters, discarded) = sk
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(counters.size <= 8)
    for ((tok, est) <- counters) {
      assert(est <= exact(tok)) // never overcounts
      assert(exact(tok) <= est + discarded) // undercount bounded
    }
    // total decrement weight can never exceed n/(capacity+1)
    assert(discarded <= stream.size / 9)
  }

  test("every item above n/(capacity+1) is guaranteed to surface") {
    val ds = spark.createDataset(stream).repartition(8)
    val Array(sk) = ds.select(new HeavyHitters(8).toColumn.name("sk"))
      .select(col("counters")).as[Map[String, Long]].collect()
    val exact = stream.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val threshold = stream.size / 9
    for ((tok, n) <- exact if n > threshold)
      assert(sk.contains(tok), s"frequent item $tok (true $n > $threshold) missing")
  }

  test("approxHeavyHitters surfaces the corpus-dominant tokens") {
    val docs = Seq(
      (1L, "alpha alpha alpha alpha beta"),
      (2L, "alpha alpha alpha gamma beta"),
      (3L, "alpha delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val out = TextOps.approxHeavyHitters(docs, capacity = 4)
      .as[(String, Long, Long)].collect()
    assert(out.length <= 4)
    assert(out.map(_._1).contains("alpha")) // 8 of 15 tokens: must surface
  }
}
