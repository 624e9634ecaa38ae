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

  /** Small-file compaction (C46): rewrite a directory into
    * ceil(bytes / targetBytes) files. The small-files problem is a
    * first-order cost at 100 TB — a table written by thousands of tasks
    * accumulates files whose per-file open/footer overhead dominates
    * scans; periodic compaction to ~128 MB files restores scan
    * efficiency. Uses repartition (not coalesce): coalesce would chain
    * upstream and skew file sizes; a narrow shuffle is the price of
    * even output files. Writes to a temp dir then swaps, so a reader
    * never sees a half-compacted directory. */
  def compact(spark: SparkSession, path: String,
              targetBytes: Long = 128L * 1024 * 1024): Long = {
    val dir = new java.io.File(path)
    val bytes = dir.listFiles().filter(_.getName.endsWith(".parquet"))
      .map(_.length()).sum
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    val tmp = path + "_compacting"
    spark.read.parquet(path)
      .repartition(nFiles.toInt)
      .write.mode(SaveMode.Overwrite).parquet(tmp)
    val old = path + "_old"
    new java.io.File(path).renameTo(new java.io.File(old))
    new java.io.File(tmp).renameTo(new java.io.File(path))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(old))
    nFiles
  }
}
