package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The library's front door: one call to get a correctly-configured
  * session (GraftExtensions wired in — native functions, the TopKPerKey
  * strategy and its optimizer rewrite), one call to mount a dataset
  * directory as SQL-addressable tables, and the whole operator surface
  * reachable either as `graft.operators.*` combinators or as plain
  * `spark.sql(...)` over the registered views.
  */
object Graft {

  val Tables: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** Session builder with the graft extensions and scale-appropriate
    * defaults. `shufflePartitions` should track cluster parallelism
    * (cores × executors at scale; cores here). */
  def session(master: String = "local[*]",
              shufflePartitions: Option[Int] = None): SparkSession = {
    val b = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
    shufflePartitions.foreach(n => b.config("spark.sql.shuffle.partitions", n))
    b.getOrCreate()
  }

  /** Wire graft's extension points into an ALREADY-RUNNING session (one
    * the caller built without `spark.sql.extensions`): the native SQL
    * functions and the TopKPerKey strategy + rewrite rule. Idempotent. */
  def install(spark: SparkSession): Unit = {
    graft.functions.GraftFunctions.register(spark)
    graft.plans.TopK.register(spark)
  }

  /** Mount every parquet table under `dir` as a temp view, so the full
    * engine surface is reachable from SQL. events gets its `ts` column
    * normalized to TimestampType on the way in, whichever physical type
    * the data generation carries (the one driver-data quirk callers
    * should never see — see SparkEntry.normalizeEventTs). Only the
    * TIMESTAMP(NANOS) generation needs the legacy nanosAsLong conf, and
    * because the view must live — and execute — in THIS session's
    * catalog, that generation sets it on this session and leaves it set:
    * that is part of what mounting such a dataset means. Query lambdas
    * that must not mutate the shared session read through a cloned
    * session instead (SparkEntry.events). */
  def registerTables(spark: SparkSession, dir: String): Unit = {
    install(spark)
    Tables.foreach { name =>
      val path = s"$dir/$name.parquet"
      if (new java.io.File(path).exists()) {
        val df =
          if (name == "events") {
            val raw =
              try spark.read.parquet(path)
              catch {
                // Retry ONLY the TIMESTAMP(NANOS) schema rejection (the
                // reader refuses the type unless nanos surface as plain
                // longs). Any other failure — corrupt file, permissions —
                // rethrows as-is, instead of a confusing second error
                // with the legacy conf left set on the shared session.
                case scala.util.control.NonFatal(e)
                    if { val m = String.valueOf(e.getMessage)
                         m.contains("TIMESTAMP(NANOS") ||
                           m.contains("Illegal Parquet type") } =>
                  spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
                  spark.read.parquet(path)
              }
            SparkEntry.normalizeEventTs(raw)
          } else spark.read.parquet(path)
        df.createOrReplaceTempView(name)
      }
    }
  }

  /** Run a registered query by SURVEY.md §2 key. */
  def query(spark: SparkSession, name: String, dir: String): DataFrame =
    SparkEntry.queries(name)(spark, dir)

  /** All registered query keys (the library's coverage inventory). */
  def queryNames: Seq[String] = SparkEntry.queries.keys.toSeq.sorted

  /** Pipeline observability via Dataset.observe (C206): attach named
    * metric expressions that the engine computes AS the job runs — zero
    * extra passes, unlike a separate .agg() action — and read them back
    * from the returned Observation after any action on the returned
    * frame. The production shape for row-count / null-count / checksum
    * assertions on a 100 TB write: the metrics ride the existing scan.
    * Metrics must be aggregates over the observed frame; the Observation
    * blocks until the action that materializes them completes. */
  def observed(df: DataFrame, metrics: (String, org.apache.spark.sql.Column)*)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    require(metrics.nonEmpty, "observed() needs at least one metric")
    // The observe node is attached to a frame rebound onto a throwaway
    // child session (plan handover via global temp view — same
    // SparkContext, no data movement): Dataset.observe initializes the
    // session's lazy ObservationManager, which is not java-serializable,
    // and a session carrying one breaks any later task closure that
    // captures the session (Spark ML training summaries do). The caller
    // acts on the returned frame exactly as before — same rows, same
    // metrics — while the caller's own session stays serializable.
    val view = "graft_obs_" + java.util.UUID.randomUUID().toString.replace("-", "")
    df.createOrReplaceGlobalTempView(view)
    val iso = df.sparkSession.newSession()
    val rebound =
      try iso.table(s"global_temp.$view")
      finally df.sparkSession.catalog.dropGlobalTempView(view)
    val obs = org.apache.spark.sql.Observation("graft_obs")
    val cols = metrics.map { case (n, c) => c.as(n) }
    (rebound.observe(obs, cols.head, cols.tail: _*), obs)
  }
}
