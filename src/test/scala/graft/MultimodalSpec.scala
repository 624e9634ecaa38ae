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

  test("resizeStub emits a constant-size grid per row, [0,1] valued") {
    val out = Multimodal.resizeStub(Multimodal.asMedia(docs), w = 4, h = 4)
      .orderBy("doc_id").collect()
    assert(out.length === 3)
    assert(out.forall(_.getAs[Seq[Float]]("pixels").length === 16))
    assert(out.forall(_.getAs[Seq[Float]]("pixels").forall(p => p >= 0f && p <= 1f)))
    // empty payload still yields the full (zeroed) grid, not a crash
    assert(out(1).getAs[Seq[Float]]("pixels").forall(_ === 0f))
  }

  test("frameSampleStub expands rows at the stride, capped, partition-stable") {
    val media = Multimodal.asMedia(docs)
    val f1 = Multimodal.frameSampleStub(media, everyNth = 2, maxFrames = 2)
      .orderBy("doc_id", "frame_idx").collect()
    assert(f1.forall(_.getAs[Int]("frame_idx") % 2 === 0))
    assert(f1.count(_.getAs[Long]("doc_id") === 1L) <= 2)
    val f2 = Multimodal.frameSampleStub(Multimodal.asMedia(docs.repartition(3)),
      everyNth = 2, maxFrames = 2).orderBy("doc_id", "frame_idx").collect()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getAs[Array[Byte]](2).toSeq)
    assert(f1.map(key).toSeq === f2.map(key).toSeq)
  }
}
