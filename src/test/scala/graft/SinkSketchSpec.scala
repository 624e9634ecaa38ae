package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.operators.TextOps
import graft.sources.ParquetSink

class SinkSketchSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet sink round-trips and prunes partitions") {
    val dir = Files.createTempDirectory("graft_sink").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ParquetSink.write(docs, dir, Seq("lang"))
    val back = ParquetSink.read(spark, dir)
    assert(back.count() === docs.count())
    // partition pruning visible in the plan: only lang=en directory scanned
    val pruned = back.filter(col("lang") === "en")
    assert(pruned.count() ===
      docs.filter(col("lang") === "en").count())
    val scan = pruned.queryExecution.executedPlan.toString
    assert(!scan.contains("PartitionFilters: []"), scan.take(800))
  }

  test("csv and json-lines sinks round-trip the corpus losslessly") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "text", "lang", "source", "n_chars")
        .as[(Long, String, String, String, Long)].collect().toSet

    val jsonDir = Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(jsonDir)
    assert(rows(spark.read.schema(docs.schema).json(jsonDir)) === rows(docs))

    // quoted CSV survives embedded commas/quotes — the reference's
    // hand-rolled splitter (NB.scala:21-34) corrupts exactly this case
    val csvDir = Files.createTempDirectory("graft_csv").toString
    val tricky = docs.limit(10).withColumn("text",
      concat(col("text"), lit(""" with, "commas" and quotes""")))
    tricky.write.mode("overwrite").option("header", "true")
      .option("quote", "\"").option("escape", "\"").csv(csvDir)
    val back = spark.read.schema(docs.schema)
      .option("header", "true").option("quote", "\"").option("escape", "\"").csv(csvDir)
    assert(rows(back) === rows(tricky))
  }

  test("orc sink round-trips losslessly and pushes filters into the scan") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang", "source", "n_chars")
    val orcDir = Files.createTempDirectory("graft_orc").toString
    docs.write.mode("overwrite").orc(orcDir)
    val back = spark.read.orc(orcDir)
    assert(back.as[(Long, String, String, String, Long)].collect().toSet ===
      docs.as[(Long, String, String, String, Long)].collect().toSet)
    // predicate pushdown reaches the ORC reader, same as parquet
    val plan = back.filter(col("n_chars") > 100)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_chars), GreaterThan(n_chars,100)]"),
      plan.take(800))
  }

  test("compaction rewrites a many-file directory into few even files, rows intact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val dir = Files.createTempDirectory("graft_compact").toString + "/t"
    docs.repartition(32).write.parquet(dir) // the small-files problem
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles === 32)
    val before = spark.read.parquet(dir).orderBy("doc_id").collect()
    graft.sources.ParquetSink.compact(spark, dir, targetBytes = 512L * 1024)
    assert(parquetFiles < 32, "fewer, larger files after compaction")
    val after = spark.read.parquet(dir).orderBy("doc_id").collect()
    assert(after === before, "compaction must be a pure rewrite")
  }

  test("jsonl shard sink: deterministic shards, manifest matches the data") {
    val dir = Files.createTempDirectory("graft_jsonl").toString + "/shards"
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text", "lang")
    graft.sources.JsonlSink.writeSharded(docs, dir, "doc_id", nShards = 4)
    val back = graft.sources.JsonlSink.read(spark, dir,
      "doc_id BIGINT, text STRING, lang STRING, shard BIGINT")
    assert(back.count() === docs.count())
    // shard assignment is a pure key function: re-deriving it from the
    // read-back rows must reproduce the directory layout exactly
    val bad = back.filter(
      pmod(xxhash64(col("doc_id")), lit(4L)) =!= col("shard")).count()
    assert(bad === 0)
    // manifest counts agree with the written shards
    val man = graft.sources.JsonlSink.manifest(docs, "doc_id", 4)
      .select("shard", "n_rows").as[(Long, Long)].collect().toMap
    val actual = back.groupBy("shard").count()
      .as[(Long, Long)].collect().toMap
    assert(man === actual)
  }

  test("HLL approx distinct tokens is within 10% of exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val approx = TextOps.approxDistinctTokens(docs)
      .as[(String, Long)].collect().toMap
    val exact = docs.select(col("lang"), explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("lang").agg(countDistinct("token").as("n"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (lang, n) =>
      assert(math.abs(approx(lang) - n) <= math.max(1L, (n * 0.1).toLong),
        s"$lang approx ${approx(lang)} vs exact $n")
    }
  }
}
