package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "hello world", "en", "s1", 11L),
    (2L, "", "en", "s1", 0L),
    (3L, "parquet bytes", "fr", "s2", 13L))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("asMedia produces binary payload with typed metadata") {
    val m = Multimodal.asMedia(docs)
    assert(m.schema("media").dataType.typeName === "binary")
    val meta = m.filter(col("doc_id") === 1).select("meta.mime", "meta.origin")
      .as[(String, String)].head()
    assert(meta === ("text/plain", "s1"))
  }

  test("extract reports exact byte lengths and stable hashes") {
    val e = Multimodal.extract(docs).orderBy("doc_id").collect()
    assert(e.map(_.getAs[Long]("n_bytes")).toSeq === Seq(11L, 0L, 13L))
    assert(e.forall { r =>
      r.getAs[Long]("fake_width") < 1920 && r.getAs[Long]("fake_height") < 1080
    })
    // md5("hello world")
    assert(e.head.getAs[String]("content_hash") === "5eb63bbbe01eeed093cb22bb8f5acdc3")
  }

  test("decodeStub is deterministic and partition-shaped") {
    val d1 = Multimodal.decodeStub(Multimodal.asMedia(docs)).orderBy("doc_id").collect()
    val d2 = Multimodal.decodeStub(Multimodal.asMedia(docs.repartition(3)))
      .orderBy("doc_id").collect()
    assert(d1.map(_.toString).toSeq === d2.map(_.toString).toSeq)
    assert(d1.head.getAs[Seq[Float]]("feature").length === 4)
  }
}
