package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType
import graft.sources.Avro

/** sources.Avro — the splittable Avro container read/write pair (C98). */
class AvroSpec extends SparkSpec {

  private val ddl = "doc_id BIGINT, text STRING, score DOUBLE, ok BOOLEAN, " +
    "meta STRUCT<author: STRING, year: BIGINT>, tags ARRAY<STRING>, raw BINARY"

  test("avro round-trip preserves rows, nested structs, arrays, binary, nulls") {
    val schema = StructType.fromDDL(ddl)
    val rows = Seq(
      Row(1L, "hello", 0.5, true, Row("ann", 2021L), Seq("a", "b"),
        Array[Byte](1, 2, 3)),
      Row(2L, null, null, false, Row(null, 2019L), Seq.empty[String], null),
      Row(3L, "third", -1.25, null, null, Seq("x"), Array[Byte]()))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    val out = s"$dir/rt"
    Avro.write(df, out)
    val back = Avro.read(spark, out, ddl)
    assert(back.schema === schema)
    def key(r: Row) = r.getLong(0)
    // field-by-field compare: byte arrays need deep equality
    val origRows = df.collect().sortBy(key)
    val backRows = back.collect().sortBy(key)
    assert(origRows.length === backRows.length)
    origRows.zip(backRows).foreach { case (o, n) =>
      for (i <- 0 until o.length) (o.get(i), n.get(i)) match {
        case (x: Array[Byte], y: Array[Byte]) => assert(x.toSeq === y.toSeq)
        case (x, y) => assert(x === y, s"field $i of doc ${key(o)}")
      }
    }
  }

  test("avro ingest query matches the ORC/JSONL twins row-for-row") {
    val av = SparkEntry.queries("avro_ingest")(spark, "unused")
      .collect().map(_.toString).sorted.toSeq
    val orc = SparkEntry.queries("orc_ingest")(spark, "unused")
      .collect().map(_.toString).sorted.toSeq
    assert(av === orc, "three formats, one logical table")
  }

  test("avro read is distributed: multi-partition write comes back complete") {
    val schema = StructType.fromDDL("id BIGINT, s STRING")
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize((1L to 1000L).map(i => Row(i, s"v$i")), 4),
      schema)
    val dir = java.nio.file.Files.createTempDirectory("graft_avro").toString
    val out = s"$dir/multi"
    Avro.write(df, out)
    val back = Avro.read(spark, out, "id BIGINT, s STRING")
    // one container file per write task; the read plans a split per file
    // at least (sync-marker splitting subdivides further on big files)
    assert(back.rdd.getNumPartitions >= 4)
    assert(back.count() === 1000L)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0)
      === 500500L)
  }
}
