package graft

import org.apache.spark.sql.functions._

/** Co-located join via bucketed tables: pre-bucketing both sides on the
  * join key removes the per-query shuffle entirely — the strategy for
  * repeatedly-joined 100 TB fact tables (SURVEY.md §4).
  */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed-by-custkey join plans without a shuffle exchange") {
    // tables land in ./spark-warehouse (gitignored) and are dropped after
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      val customer = spark.read.parquet("/root/testdata/sf0.001/customer.parquet")
      orders.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .mode("overwrite").saveAsTable("orders_b")
      customer.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .mode("overwrite").saveAsTable("customer_b")

      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      // the join itself must not shuffle either side (bucketing co-locates);
      // only the final small aggregation exchanges
      val shufflesForJoin = "Exchange hashpartitioning\\((o_custkey|c_custkey)".r
        .findAllIn(plan).length
      assert(shufflesForJoin === 0, plan.take(1200))

      val expected = orders.join(customer, col("o_custkey") === col("c_custkey"))
        .groupBy("c_nationkey").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      val got = joined.collect().map(r => (r.getInt(0), r.getLong(1))).toSet
      assert(got === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }
}
