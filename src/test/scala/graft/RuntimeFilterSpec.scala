package graft

import org.apache.spark.sql.functions._

/** C34: Spark's runtime bloom-filter join pruning (InjectRuntimeFilter).
  * When one side of a shuffle join carries a selective filter, the
  * optimizer builds a bloom filter over that side's join keys and pushes
  * a might_contain probe into the OTHER side's scan — at 100 TB this is
  * the difference between shuffling the full probe table and shuffling
  * only rows that can possibly match. The engine relies on this (plus
  * AQE) rather than hand-rolling semi-join prefilters, so this spec
  * pins the conditions under which Spark actually injects it.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective shuffle join injects a bloom filter into the probe side") {
    val s = spark.newSession() // conf changes stay scoped to this test
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    // local test data is far below the production-sized defaults
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "1B")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    val sf = "/root/testdata/sf0.01"
    val lineitem = s.read.parquet(s"$sf/lineitem.parquet")
    val orders = s.read.parquet(s"$sf/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val joined = lineitem.join(orders, col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(optimized.toLowerCase.contains("bloom"),
      s"expected an injected bloom filter in:\n${optimized.take(2000)}")
    // and the filtered plan still computes the right answer
    val n = joined.collect().head.getLong(1)
    val expected = lineitem.join(
        s.read.parquet(s"$sf/orders.parquet")
          .filter(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(n === expected)
  }
}
