package graft

import org.apache.spark.sql.functions._

/** CacheTracker.drainAll — the round-13 harness fix: between queries it
  * must free EVERY persisted block, including localCheckpoint blocks
  * that [[CacheTracker.track]] never saw (iterative operators pin one
  * per round and have no safe point to release them themselves). */
class CacheTrackerSpec extends SparkSpec {

  test("drainAll frees tracked caches AND untracked localCheckpoint blocks") {
    CacheTracker.drainAll(spark) // start from a clean slate
    val before = spark.sparkContext.getPersistentRDDs.size
    val tracked = CacheTracker.track(
      spark.range(100).toDF("id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    tracked.count()
    val orphan = spark.range(100).select(col("id"), (col("id") * 2).as("x"))
      .localCheckpoint(true) // NOT tracked — the bradley_terry shape
    assert(orphan.count() === 100L)
    assert(spark.sparkContext.getPersistentRDDs.size > before)
    CacheTracker.drainAll(spark)
    assert(spark.sparkContext.getPersistentRDDs.isEmpty,
      "every persisted block (tracked or checkpoint-orphaned) must be freed")
  }

  test("drainAll after consumption leaves results usable (values already materialized)") {
    val df = spark.range(10).toDF("id").localCheckpoint(true)
    val sum = df.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
    CacheTracker.drainAll(spark)
    assert(sum === 45L)
  }
}
