package graft.bench
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object SimhashAb {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .repartition(32)
    val toked = docs.select(col("doc_id"), graft.operators.TextOps.tokens(col("text")).as("toks"))
    def time(tag: String)(f: => Unit): Unit = {
      f // warm
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(s"$tag: ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }
    time("declarative") {
      graft.operators.Dedup.simhashFpDeclarative(toked)
        .write.format("noop").mode("overwrite").save() }
    time("native") {
      toked.filter(size(col("toks")) > 0)
        .select(col("doc_id"), graft.functions.GraftFunctions.simhash(col("toks")).as("simhash"))
        .write.format("noop").mode("overwrite").save() }
    spark.stop()
  }
}
