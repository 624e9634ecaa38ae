package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted join equals the plain join on a skewed key") {
    // 90% of big rows share key 1 — the power-law shape salting targets
    val big = (1L to 1000L).map(i => (if (i <= 900) 1L else i % 50, i))
      .toDF("k", "payload")
    val small = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "name")

    val plain = big.join(small, "k").select("k", "payload", "name")
      .as[(Long, Long, String)].collect().toSet
    val salted = Skew.saltedJoin(big, small, "k").select("k", "payload", "name")
      .as[(Long, Long, String)].collect().toSet
    assert(salted === plain)
    assert(salted.count(_._1 == 1L) === plain.count(_._1 == 1L))
    assert(salted.count(_._1 == 1L) >= 900)
  }

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // C39: the engine's primary skew answer is AQE's runtime re-plan —
    // salting (above) is the fallback for joins AQE can't touch. This
    // pins the confs under which the skew-join rule actually fires.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // local data is tiny vs production defaults (256MB threshold)
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    import s.implicits._
    val pad = "x" * 100
    val big = s.createDataset((1L to 20000L).map(i =>
      (if (i <= 18000) 1L else i % 50, pad + i)))(implicitly).toDF("k", "payload")
    val small = s.createDataset((0L until 50L).map(k => (k, s"dim_$k")))(implicitly)
      .toDF("k", "name")
    val joined = big.join(small, "k")
    // materialize THIS queryExecution — count() would plan a separate one
    // and leave joined's adaptive plan unexecuted (isFinalPlan=false)
    assert(joined.collect().length === 20000)
    val finalPlan = joined.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"expected AQE skew-split in final plan:\n${finalPlan.take(1500)}")
  }
}
