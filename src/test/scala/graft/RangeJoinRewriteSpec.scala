package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational
import graft.plans.RangeJoinRewrite

/** The optimizer rule that turns a raw equi-join + bounded time residual
  * into the binned range-join shape — user code written naively still
  * gets the skew-safe plan. */
class RangeJoinRewriteSpec extends SparkSpec {
  import spark.implicits._

  // left: one row per (key, anchor ts); right: (key, event ts) streams
  private lazy val anchors = Seq(
    (1L, 1000L), (1L, 5000L), (2L, 100L), (3L, -250L))
    .toDF("k", "at")
  private lazy val probes = Seq(
    (1L, 900L), (1L, 1000L), (1L, 1L), (1L, 4500L), (1L, 5000L),
    (2L, 50L), (2L, 101L), (3L, -300L), (3L, -249L))
    .toDF("k", "bt")

  private def rawJoin(strictLower: Boolean) = {
    val lower = if (strictLower) col("bt") > col("at") - 100L
    else col("bt") >= col("at") - 100L
    anchors.join(probes,
      anchors("k") === probes("k") && col("bt") <= col("at") && lower)
      .select(anchors("k").as("k"), col("at"), col("bt"))
  }

  test("raw bounded-lookback join is rewritten to the binned shape") {
    RangeJoinRewrite.register(spark)
    val df = rawJoin(strictLower = false)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("_graft_bin"), optimized.take(800))
    assert(optimized.contains("Generate explode"), optimized.take(800))
    // results identical to the hand-built operator on the same frames
    val manual = Relational.rangeJoin(anchors, probes, "k", "at", "bt", 100L)
      .select("k", "at", "bt").as[(Long, Long, Long)].collect().sorted.toSeq
    val got = df.as[(Long, Long, Long)].collect().sorted.toSeq
    assert(got === manual)
    // and identical to the brute-force predicate on collected rows
    val brute = for {
      a <- anchors.as[(Long, Long)].collect()
      b <- probes.as[(Long, Long)].collect()
      if a._1 == b._1 && b._2 <= a._2 && b._2 >= a._2 - 100L
    } yield (a._1, a._2, b._2)
    assert(got === brute.sorted.toSeq)
  }

  test("strict lower bound survives as residual; negatives bin correctly") {
    RangeJoinRewrite.register(spark)
    val got = rawJoin(strictLower = true)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    val brute = for {
      a <- anchors.as[(Long, Long)].collect()
      b <- probes.as[(Long, Long)].collect()
      if a._1 == b._1 && b._2 <= a._2 && b._2 > a._2 - 100L
    } yield (a._1, a._2, b._2)
    assert(got === brute.sorted.toSeq)
    // the negative-timestamp pair (k=3, at=-250, bt=-300) is a true
    // match and must survive trunc-division binning
    assert(got.contains((3L, -250L, -300L)))
  }

  test("forward window [a, a+w] is rewritten with {bin, bin+1} probes") {
    RangeJoinRewrite.register(spark)
    val df = anchors.join(probes,
        anchors("k") === probes("k") &&
          col("bt") >= col("at") && col("bt") <= col("at") + 100L)
      .select(anchors("k").as("k"), col("at"), col("bt"))
    assert(df.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
    val got = df.as[(Long, Long, Long)].collect().sorted.toSeq
    val brute = (for {
      a <- anchors.as[(Long, Long)].collect()
      b <- probes.as[(Long, Long)].collect()
      if a._1 == b._1 && b._2 >= a._2 && b._2 <= a._2 + 100L
    } yield (a._1, a._2, b._2)).sorted.toSeq
    assert(got === brute)
    // forward coverage across the negative-bin boundary
    assert(got.contains((3L, -250L, -249L)))
  }

  test("property sweep: rewrite equals brute force on randomized frames") {
    RangeJoinRewrite.register(spark)
    val rnd = new scala.util.Random(42) // deterministic sweep
    for (trial <- 1 to 24) {
      val w = Seq(1L, 7L, 100L, 3600L)(rnd.nextInt(4))
      val nA = 5 + rnd.nextInt(20)
      val nB = 5 + rnd.nextInt(40)
      def ts() = rnd.nextLong() % 10000L // negatives included
      val as = Seq.fill(nA)((rnd.nextInt(5).toLong, ts()))
      val bs = Seq.fill(nB)((rnd.nextInt(5).toLong, ts()))
      val aDf = as.toDF("k", "at")
      val bDf = bs.toDF("k", "bt")
      val strict = rnd.nextBoolean()
      val forward = rnd.nextBoolean()
      val cond =
        if (forward) {
          val upper = if (strict) col("bt") < col("at") + w
          else col("bt") <= col("at") + w
          col("bt") >= col("at") && upper
        } else {
          val lower = if (strict) col("bt") > col("at") - w
          else col("bt") >= col("at") - w
          col("bt") <= col("at") && lower
        }
      val df = aDf.join(bDf, aDf("k") === bDf("k") && cond)
        .select(aDf("k"), col("at"), col("bt"))
      assert(df.queryExecution.optimizedPlan.toString.contains("_graft_bin"),
        s"trial $trial should rewrite (forward=$forward)")
      val got = df.as[(Long, Long, Long)].collect().sorted.toSeq
      val brute = (for {
        (ka, at) <- as
        (kb, bt) <- bs
        if ka == kb && (if (forward)
          bt >= at && (if (strict) bt < at + w else bt <= at + w)
        else
          bt <= at && (if (strict) bt > at - w else bt >= at - w))
      } yield (ka, at, bt)).sorted
      assert(got === brute, s"trial $trial w=$w strict=$strict forward=$forward")
    }
  }

  test("no rewrite without a cross-side equi-key") {
    RangeJoinRewrite.register(spark)
    val df = anchors.join(probes,
      col("bt") <= col("at") && col("bt") >= col("at") - 100L)
    assert(!df.queryExecution.optimizedPlan.toString.contains("_graft_bin"))
  }

  test("no rewrite of an already-binned join (manual rangeJoin untouched)") {
    RangeJoinRewrite.register(spark)
    val manual = Relational.rangeJoin(anchors, probes, "k", "at", "bt", 100L)
    val optimized = manual.queryExecution.optimizedPlan.toString
    // exactly one explode: the one rangeJoin itself built
    assert("explode".r.findAllIn(optimized).size === 1, optimized.take(800))
  }
}
