package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: EXECUTE a SparkEntry query (noop sink) and dump its final
  * physical plan — with AQE on, exchange/subtree reuse only materializes
  * at runtime (the static `Explain` dump shows `isFinalPlan=false` and no
  * ReusedExchange), so plan-reuse claims are only checkable from the
  * executed plan. Usage: runMain graft.ExplainExec [sfDir] [query...]
  */
object ExplainExec {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val only = args.drop(1).toSet
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (only.isEmpty || only.contains(name)) {
        println(s"\n========== $name (executed) ==========")
        try {
          val df = fn(spark, sfDir)
          df.write.format("noop").mode("overwrite").save()
          println(df.queryExecution.executedPlan.toString)
        } catch { case e: Throwable => println(s"ERROR: ${e.getMessage}") }
        CacheTracker.drainAll(spark)
      }
    }
    spark.stop()
  }
}
