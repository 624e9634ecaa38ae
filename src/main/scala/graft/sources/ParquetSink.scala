package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Partitioned parquet sink/source pair.
  *
  * The reference writes flat text splits to HDFS
  * (reference Hadoop/NB.java job output, Spark programs print to stdout);
  * the engine's persistent format is hive-style partitioned parquet so
  * downstream scans get partition pruning for free. `maxRecordsPerFile`
  * bounds file sizes at scale; writing is append-idempotent per partition
  * directory under dynamic overwrite.
  */
object ParquetSink {

  def write(df: DataFrame, path: String, partitionBy: Seq[String],
            maxRecordsPerFile: Long = 5000000L): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame = spark.read.parquet(path)
}
