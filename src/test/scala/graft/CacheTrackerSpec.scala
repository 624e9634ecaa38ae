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

  test("cachedCount memoizes per canonicalized plan and clears on releaseAll") {
    CacheTracker.releaseAll()
    @volatile var jobs = 0
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    // listener delivery is async: poll until the counter holds still
    def settle(): Int = {
      var prev = jobs; var stable = 0; var iters = 0
      while (stable < 3 && iters < 50) {
        Thread.sleep(10)
        if (jobs == prev) stable += 1 else { stable = 0; prev = jobs }
        iters += 1
      }
      jobs
    }
    spark.sparkContext.addSparkListener(l)
    try {
      val df = spark.range(1000).toDF("id").filter(col("id") % 2 === 0)
      assert(CacheTracker.cachedCount(df) === 500L)
      val after1 = settle()
      // a FRESH frame with the same canonicalized plan hits the memo: no job
      val df2 = spark.range(1000).toDF("id").filter(col("id") % 2 === 0)
      assert(CacheTracker.cachedCount(df2) === 500L)
      assert(settle() === after1, "memo hit must not run a count job")
      // the harness query boundary clears the memo: the count job re-runs
      CacheTracker.releaseAll()
      assert(CacheTracker.cachedCount(df) === 500L)
      assert(settle() > after1, "releaseAll must invalidate the memo")
    } finally spark.sparkContext.removeSparkListener(l)
  }
}
