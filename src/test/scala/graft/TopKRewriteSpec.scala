package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopKRewrite

class TopKRewriteSpec extends SparkSpec {
  import spark.implicits._

  private lazy val data = {
    val rnd = new scala.util.Random(17)
    (1 to 5000).map(i => (rnd.nextInt(10).toLong, i.toLong, rnd.nextDouble()))
      .toDF("k", "id", "score")
  }

  private def windowTopK(n: Int) = {
    val w = Window.partitionBy("k").orderBy(col("score").desc, col("id"))
    data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= n).select("k", "id")
  }

  test("window row_number idiom is rewritten to the heap operator") {
    TopKRewrite.register(spark)
    val df = windowTopK(4)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), plan.take(800))
    assert(!plan.contains("Window"), plan.take(800))

    // results identical to what the window form computes
    val expected = data.collect().toSeq
      .groupBy(_.getLong(0))
      .values.flatMap { rows =>
        rows.sortBy(r => (-r.getDouble(2), r.getLong(1))).take(4)
      }
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(df.as[(Long, Long)].collect().toSet === expected)
  }

  test("no rewrite when the rank column is observable") {
    TopKRewrite.register(spark)
    val w = Window.partitionBy("k").orderBy(col("score").desc, col("id"))
    val df = data.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3).select("k", "id", "rn")
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan.take(800))
  }
}
