package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Benchmark main: one warmup pass (JIT + codegen + catalog caches), one
  * measured pass over every SparkEntry query. Prints one JSON line. */
object Bench {

  /** Force FULL evaluation. A bare .count() lets Catalyst prune every
    * unused column, so narrow per-row queries (clean_text, quality_score,
    * ...) would benchmark as parquet row counts with the regex/hash work
    * optimized away. The noop sink consumes every output column without
    * writing anywhere. */
  private def force(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** Sum of all collectors' accumulated stop-the-world time. Deltas around
    * a timed query attribute GC pauses to it — the diagnostic that separates
    * a genuinely slow plan from an environment/wake effect (a 42.8 s reading
    * whose gc_ms delta is tiny and unrepeatable is wake, not plan). */
  private def gcMillis(): Long = {
    import scala.jdk.CollectionConverters._
    java.lang.management.ManagementFactory.getGarbageCollectorMXBeans.asScala
      .map(_.getCollectionTime).filter(_ > 0).sum
  }

  /** Poll `counter` until it holds still for two consecutive 10 ms reads
    * (max 200 ms): a cheap stand-in for LiveListenerBus.waitUntilEmpty,
    * which is private[spark]. */
  private def settle(counter: () => Long): Unit = {
    var prev = counter(); var stable = 0; var iters = 0
    while (stable < 2 && iters < 20) {
      Thread.sleep(10)
      val c = counter()
      if (c == prev) stable += 1 else { stable = 0; prev = c }
      iters += 1
    }
  }

  /** Accumulates shuffle/aggregation spill bytes across all tasks; deltas
    * around a timed query show whether its partitions fit in memory. Also
    * counts jobs, so a timed reading is attributable from the artifact
    * (a 75 s query with 60 jobs is an iterative chain paying per-job
    * latency; one with 3 jobs is a slow plan). */
  private final class SpillListener extends org.apache.spark.scheduler.SparkListener {
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
      val m = te.taskMetrics
      if (m != null) bytes.addAndGet(m.memoryBytesSpilled + m.diskBytesSpilled)
    }
    override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
      jobs.incrementAndGet(); ()
    }
  }

  /** Release EVERY block a query left in the BlockManager, not just the
    * CacheTracker-registered result caches: iterative operators pin
    * per-round localCheckpoint blocks (bradley_terry, token_label_prop,
    * kmeans variants) that CacheTracker never sees, because unpersisting
    * a checkpointed frame mid-consumption would be a correctness bug.
    * Across a 376-query pass those orphans accumulate (they free only on
    * GC + ContextCleaner), bloating the BlockManager until later queries'
    * MEMORY_AND_DISK caches thrash — the round-12 official-vs-internal
    * 2× inflation signature. Between queries every block is garbage by
    * contract (each query rebuilds its own caches), so drain them all. */
  private def drainBlocks(spark: SparkSession): Unit = CacheTracker.drainAll(spark)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // static conf, default 100: a multi-hundred-query pass generates far
      // more codegen'd classes than that, so the LRU thrashes and Janino
      // recompiles the same stages all pass long — pure driver-side churn
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // ERROR, not WARN: WindowExec/other WARNs interleave with (and in the
    // worst case split) the one-line JSON contract the driver tails for.
    spark.sparkContext.setLogLevel("ERROR")
    // optional args subset the benched queries (dev loop, same as Verify)
    val subset = args.toSet
    val unknown = subset.diff(SparkEntry.queries.keySet)
    require(unknown.isEmpty, s"unknown query names: ${unknown.mkString(", ")}")
    val ordered = SparkEntry.queries.toSeq
      .filter { case (name, _) => subset.isEmpty || subset(name) }
      .sortBy(_._1)
    // Warm immediately before timing, per query: a single warm-all pass
    // followed by a time-all pass lets 80+ intervening queries churn the
    // JIT/codegen caches, so the timed run re-pays compilation (round-4
    // numbers showed 2-5x inflation on exactly the queries farthest from
    // their warmup). Steady-state is warm-then-time back to back.
    val spill = new SpillListener
    spark.sparkContext.addSparkListener(spill)
    // JVM warm-in before the FIRST timed slot: position 1 otherwise runs
    // on a one-warmup-old JVM whose C2 tiers haven't compiled the scan/
    // agg hot paths the rest of the pass enjoys — the r16/r17 artifacts
    // both show whichever query sorts first (ab_ttest) reading ~5× its
    // own solo median with gc 0 / spill 0 / identical jobs. Three extra
    // forced runs of the first query cost ~1 s once and put slot 1 on
    // the same steady-state footing as slots 2..n.
    ordered.headOption.foreach { case (_, fn) =>
      (1 to 3).foreach { _ =>
        try force(fn(spark, sfDir)) catch { case _: Throwable => () }
        drainBlocks(spark)
      }
    }
    val results = ordered.map { case (name, fn) =>
      try force(fn(spark, sfDir)) catch { case _: Throwable => () }
      drainBlocks(spark)
      // listener delivery is async and the bus is private[spark]: settle
      // the spill counter (poll until stable) so the warmup's task-end
      // events don't bleed into the timed delta. Outside t0, so per-query
      // timings are unaffected.
      settle(() => spill.bytes.get())
      val (gc0, sp0, jb0) = (gcMillis(), spill.bytes.get(), spill.jobs.get())
      val t0 = System.nanoTime()
      // build (plan construction + analysis + any operator-eager stats
      // jobs) timed separately from execution, so an inflated official
      // reading is attributable to one or the other from the artifact
      var tBuild = t0
      val ok = try {
        val df = fn(spark, sfDir)
        tBuild = System.nanoTime()
        force(df); true
      } catch { case _: Throwable => false }
      // a crashed query reports -1, never a fake timing
      val dt = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      settle(() => spill.bytes.get())
      drainBlocks(spark) // release AFTER the timing: unpersist is bookkeeping, not query work
      (name, dt, gcMillis() - gc0, spill.bytes.get() - sp0,
        spill.jobs.get() - jb0, (tBuild - t0) / 1000000L)
    }
    val timings = results.map(r => r._1 -> r._2)
    // total covers successful queries only; failures stay visible as -1
    val total = timings.map(_._2).filter(_ >= 0).sum
    // Self-adjudication for official-pass outliers: re-time solo (×3,
    // median) AFTER the full pass, in the same JVM, every query that is
    // either among the 15 slowest OR >2.5× the pass median — the r15
    // discount_elasticity lesson: a 8.9 s reading on a 0.8 s plan sat
    // outside the top-15 net and consumed a verdict cycle that this wider
    // net would have self-adjudicated. An official reading far above its
    // own same-run solo median is thereby attributable to pass-level
    // effects (arrival order, cache residency, listener backlog) from the
    // artifact alone. Skipped for subset (dev A/B) runs, which ARE solo.
    val okResults = results.filter(_._2 >= 0)
    val passMedian =
      if (okResults.isEmpty) 0.0
      else okResults.map(_._2).sorted.apply(okResults.size / 2)
    val soloSet: Seq[(String, Double, Long, Long, Long, Long)] = {
      val top15 = okResults.sortBy(-_._2).take(15)
      val outliers = okResults.filter(_._2 > 2.5 * passMedian)
      (top15 ++ outliers).distinctBy(_._1)
    }
    val soloMedians: Seq[(String, Double)] =
      if (subset.nonEmpty) Seq.empty
      else soloSet.map { r =>
        val fn = SparkEntry.queries(r._1)
        val ts = (1 to 3).map { _ =>
          drainBlocks(spark)
          settle(() => spill.bytes.get())
          val t0 = System.nanoTime()
          val ok = try { force(fn(spark, sfDir)); true }
                   catch { case _: Throwable => false }
          if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
        }.sorted
        r._1 -> ts(1)
      }
    // The full 190-query map is ~3.3 KB — longer than the tail window the
    // driver keeps, so a single fat line arrives truncated and unparseable
    // (rounds 2-7 all recorded parsed=null). Full map goes to a file; the
    // stdout line stays under ~1.5 KB with a family-covering headline set.
    // gc_ms / spill_bytes per query: wake effects (GC storms, eviction
    // churn) are diagnosable from the artifact instead of re-runs
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_FULL.json")),
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(timings)},""" +
        s""""gc_ms":${jlong(results.map(r => r._1 -> r._3))},""" +
        s""""spill_bytes":${jlong(results.map(r => r._1 -> r._4))},""" +
        s""""jobs":${jlong(results.map(r => r._1 -> r._5))},""" +
        s""""build_ms":${jlong(results.map(r => r._1 -> r._6))},""" +
        s""""solo_median":${jmap(soloMedians)},"sf":"$sfDir"}""")
    // subset runs (dev A/B) show exactly what was asked for
    val head = if (subset.nonEmpty) jmap(timings)
      else jmap(timings.filter(r => headline(r._1)))
    // Stop Spark FIRST so its shutdown logging cannot land after (or inside)
    // the JSON line; the headline is the final thing this JVM prints. A
    // stop() that throws (executor shutdown races happen) must not eat the
    // contract line — that is the rounds-2-7 parsed=null failure again.
    try spark.stop()
    catch { case e: Throwable => System.err.println(s"spark.stop failed: $e") }
    println(headlineLine(total, results.size, head, sfDir))
    System.out.flush()
  }

  private[graft] def jmap(rs: Seq[(String, Double)]): String = rs
    .map { case (k, v) => "\"" + k + "\":" + (math.round(v * 1000) / 1000.0) }
    .mkString("{", ",", "}")

  private[graft] def jlong(rs: Seq[(String, Long)]): String = rs
    .map { case (k, v) => "\"" + k + "\":" + v }
    .mkString("{", ",", "}")

  /** The queries whose timings ride on the one-line stdout contract —
    * one or two per operator family. Grow this set only with an eye on
    * [[headlineLine]]'s budget (BenchContractSpec pins it). */
  private[graft] val headline = Set(
    "lineitem_agg", "tpch_q3", "tpch_q5", "tpch_q9", "tpch_q18", "tpch_q21",
    "orders_join", "asof_join", "range_join", "events_window",
    "events_sessionize", "events_rolling", "clean_text", "tfidf", "bm25",
    "token_pmi", "token_pagerank", "dedup_exact", "minhash_lsh",
    "dedup_components", "semantic_dedup", "paragraph_dedup", "span_dedup",
    "ann_topk",
    "ann_ivf", "ann_recall", "kmeans_lloyd", "random_projection",
    "embed_centroids", "quality_score", "gopher_filter", "curation_pipeline",
    "sequence_pack", "contamination_check", "doc_similarity_pruned",
    "nb_scratch", "svm_predictions", "ngram_novelty", "source_overlap")

  /** The driver-parsed stdout line. Contract (BenchContractSpec): valid
    * JSON, and comfortably under the ~2 KB tail window the driver keeps
    * even at worst-case timing widths. */
  private[graft] def headlineLine(total: Double, nQueries: Int,
                                  queriesJson: String, sfDir: String): String =
    s"""{"metric":"total","value":$total,"unit":"sec","n_queries":$nQueries,"queries":$queriesJson,"full":"BENCH_FULL.json","sf":"$sfDir"}"""
}
