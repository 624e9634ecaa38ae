package graft

import org.apache.spark.sql.functions._

/** A1: quoted-CSV ingest. The reference's hand-rolled splitter
  * (reference Spark/NB/src/main/scala/NB.scala:21-34) drops embedded
  * commas when re-stitching over-split columns; Spark's native reader with
  * quote/escape handling must preserve them.
  */
class CsvIngestSpec extends SparkSpec {

  private lazy val df = SparkEntry.queries("csv_ingest")(spark, "")

  test("reads all rows and columns") {
    assert(df.count() === 10)
    assert(df.columns.toSeq ===
      Seq("item_id", "sentiment", "sentiment_source", "sentiment_text"))
  }

  test("embedded commas survive (the reference splitter bug does not recur)") {
    val t1 = df.filter(col("item_id") === "1").select("sentiment_text").head().getString(0)
    assert(t1.contains("slow, broken, and sad"))
    val t4 = df.filter(col("item_id") === "4").select("sentiment_text").head().getString(0)
    assert(t4 === "quoted text with \"escaped quotes\" and a comma, inside")
  }

  test("ORC ingest matches the JSONL twin row for row, and filters push down") {
    val orc = SparkEntry.queries("orc_ingest")(spark, "")
    val json = SparkEntry.queries("json_ingest")(spark, "")
    assert(orc.collect().map(_.toString).sorted.toSeq ===
      json.collect().map(_.toString).sorted.toSeq)
    // ORC scans must push predicates like the parquet ones do
    val plan = spark.read.orc("/root/repo/src/test/resources/docs_sample.orc")
      .filter(col("doc_id") > 2).select("doc_id", "lang")
      .queryExecution.executedPlan.toString
    // match each pushed filter independently — the bracket's ordering and
    // spacing are Spark-version formatting, not the contract under test
    assert(plan.contains("PushedFilters:"), plan.take(600))
    assert(plan.contains("GreaterThan(doc_id,2)"), plan.take(600))
    assert(plan.contains("IsNotNull(doc_id)"), plan.take(600))
  }
}
