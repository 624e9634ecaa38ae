package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** JSONL shard export (C84) — the interchange format every
  * training-data consumer reads. Rows are sharded by a DETERMINISTIC
  * key hash (never round-robin: task retries must land a row in the
  * same shard for idempotent re-runs), compressed, and accompanied by a
  * manifest the consumer can verify against.
  *
  * Scale shape: one hash shuffle to the shard key; the manifest is a
  * per-shard aggregate of the same frame, not a driver-side directory
  * walk, so it parallelizes and is exact at any size.
  */
object JsonlSink {

  /** Write `df` as `nShards` gzip JSONL shards, keyed by `keyCol`. */
  def writeSharded(df: DataFrame, path: String, keyCol: String,
                   nShards: Int = 8): Unit =
    df.withColumn("shard", pmod(xxhash64(col(keyCol)), lit(nShards.toLong)))
      .repartition(nShards, col("shard"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("shard")
      .option("compression", "gzip")
      .json(path)

  /** Per-shard manifest computed FROM THE DATA (row count + an
    * order-independent content digest over the key column) — what the
    * consumer recomputes to verify a transfer. */
  def manifest(df: DataFrame, keyCol: String, nShards: Int = 8): DataFrame =
    df.withColumn("shard", pmod(xxhash64(col(keyCol)), lit(nShards.toLong)))
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_rows"),
        md5(concat_ws(",",
          sort_array(collect_list(col(keyCol).cast("string"))))).as("key_digest"))

  def read(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read.schema(schema).json(path)
}
