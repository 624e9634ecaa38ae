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
}
