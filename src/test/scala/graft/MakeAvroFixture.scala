package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** One-off generator for src/test/resources/docs_sample.avro — the Avro
  * twin of docs_sample.jsonl (same rows, same nested schema), written
  * through sources.Avro so the committed fixture exercises the sink
  * path too. Run: sbt "Test/runMain graft.MakeAvroFixture". */
object MakeAvroFixture {
  val Ddl: String = "doc_id BIGINT, text STRING, lang STRING, " +
    "meta STRUCT<author: STRING, year: BIGINT>, tags ARRAY<STRING>"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val df = spark.read.schema(Ddl)
      .json("/root/repo/src/test/resources/docs_sample.jsonl")
    val tmp = "/tmp/graft_avro_fixture"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(tmp))
    graft.sources.Avro.write(df.coalesce(1), tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(_.getName.endsWith(".avro"))
      .getOrElse(sys.error(s"no .avro part file under $tmp"))
    Files.copy(part.toPath,
      Paths.get("/root/repo/src/test/resources/docs_sample.avro"),
      StandardCopyOption.REPLACE_EXISTING)
    println(s"wrote docs_sample.avro (${part.length()} bytes)")
    spark.stop()
  }
}
