package graft.bench

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** "Functions, not UDFs" — measured (BASELINE.md): the SAME cosine
  * top-k workload (every embedding scored against a broadcast query set,
  * ann_topk's shape) three ways:
  *
  *  1. native  — graft_cosine, a codegen'd Catalyst Expression: stays
  *     inside whole-stage codegen, no boxing, no Row bridge;
  *  2. udf     — a Scala UDF over the two float arrays: breaks the
  *     codegen span and pays per-row serialization into Scala land;
  *  3. declarative — zip_with + aggregate built-ins: codegen'd lambda
  *     loops, no custom expression needed.
  *
  * Each variant runs `reps` times after a warmup; the printed medians
  * are what BASELINE.md cites. The ranking work (TopKPerKey + window)
  * is held identical so the delta isolates the scoring expression. */
object UdfAb {

  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  private def timeMedian(reps: Int)(mk: => DataFrame): Double = {
    val ts = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      force(mk)
      (System.nanoTime() - t0) / 1e9
    }
    ts.sorted.apply(reps / 2)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val m = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val reps = 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // m-way multiplied corpus so the scoring loop dominates scheduling
    val emb = ScaleCheck.multiplyEmb(emb0, m)
      .repartition(spark.sparkContext.defaultParallelism)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count()

    val q = broadcast(emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb")))
    def scored(cos: (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column) =
      q.join(emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")),
          col("q_id") =!= col("n_id"))
        .select(col("q_id"), col("n_id"),
          round(cos(col("q_emb"), col("n_emb")), 6).as("cos"))
        .groupBy("q_id").agg(max(col("cos")).as("best")) // cheap identical sink

    val cosUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i); i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }

    // warmup all three once
    force(scored(graft.functions.GraftFunctions.cosine))
    force(scored((x, y) => cosUdf(x, y)))
    force(scored(graft.operators.Similarity.cosineDeclarative))

    val tNative = timeMedian(reps)(scored(graft.functions.GraftFunctions.cosine))
    val tUdf = timeMedian(reps)(scored((x, y) => cosUdf(x, y)))
    val tDecl = timeMedian(reps)(scored(graft.operators.Similarity.cosineDeclarative))
    println(s"""{"vectors":$n,"reps":$reps,"native_sec":$tNative,""" +
      s""""udf_sec":$tUdf,"declarative_sec":$tDecl,""" +
      s""""udf_over_native":${tUdf / tNative}}""")
    spark.stop()
  }
}
