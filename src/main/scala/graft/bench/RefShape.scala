package graft.bench

import org.apache.spark.ml.classification.{LinearSVC, NaiveBayes}
import org.apache.spark.ml.feature.{HashingTF, IDF, Tokenizer}
import org.apache.spark.mllib.evaluation.MulticlassMetrics
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Baseline comparator: the reference pipeline re-created shape-for-shape
  * so BASELINE.md can quote a measured single-node number at our data
  * scale. This is NOT part of the engine — it deliberately keeps the
  * reference's design decisions that the engine rejects:
  *
  *  - per-row regex cleanup on an RDD (reference
  *    Spark/NB/src/main/scala/NB.scala:45-60) instead of codegen'd
  *    Column expressions;
  *  - ml.Tokenizer -> HashingTF(default 2^18) -> IDF (NB.scala:71-80);
  *  - randomSplit(0.75/0.25, seed 1234) (NB.scala:83);
  *  - metrics via a .rdd round-trip into MulticlassMetrics (NB.scala:94-99).
  *
  * Input is the driver-generated documents parquet (the reference read
  * tweet CSV from HDFS; the payload column is equivalent).
  */
object RefShape {

  private def cleanRdd(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    docs.select("doc_id", "text", "lang").rdd
      .map { r =>
        val label = r.getString(2) match {
          case "en" => 0.0; case "fr" => 1.0; case "es" => 2.0
          case "zh" => 3.0; case "de" => 4.0; case _ => 5.0
        }
        val cleaned = r.getString(1)
          .replaceAll("(?i)(https?://\\S+|www\\.\\S+)", "")
          .replaceAll("[@#&]\\w+", "")
          .replaceAll("\\d+", "")
          .replaceAll("[^a-zA-Z ]", " ")
          .toLowerCase()
          .trim()
          .replaceAll("\\s+", " ")
        (label, cleaned)
      }
      .toDF("label", "tweet")
  }

  /** End-to-end reference-shaped run; returns (accuracy, weightedF1). */
  def run(spark: SparkSession, docs: DataFrame, algo: String): (Double, Double) = {
    val input = cleanRdd(spark, docs)
    val words = new Tokenizer().setInputCol("tweet").setOutputCol("words").transform(input)
    val tf = new HashingTF().setInputCol("words").setOutputCol("rawFeatures").transform(words)
    val idfModel = new IDF().setInputCol("rawFeatures").setOutputCol("features").fit(tf)
    val rescaled = idfModel.transform(tf)
    val Array(train, test) = rescaled.randomSplit(Array(0.75, 0.25), seed = 1234L)
    val predictions = algo match {
      case "nb" => new NaiveBayes().fit(train).transform(test)
      case _ =>
        // reference SVM is binary: en-vs-rest (SVM.scala:89-91 params)
        val bin = (df: DataFrame) => {
          import org.apache.spark.sql.functions._
          df.withColumn("label", when(col("label") === 0.0, 1.0).otherwise(0.0))
        }
        new LinearSVC().setMaxIter(10).setRegParam(0.1)
          .fit(bin(train)).transform(bin(test))
    }
    val pl = predictions.select("prediction", "label").rdd
      .map(r => (r.getDouble(0), r.getDouble(1)))
    val metrics = new MulticlassMetrics(pl)
    (metrics.accuracy, metrics.weightedFMeasure)
  }
}
