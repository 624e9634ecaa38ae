package graft

import org.apache.spark.sql.functions._
import graft.operators._

/** Round-12 operators: the iterated BPE trainer, HTML/boilerplate
  * extraction, URL canonicalization. */
class Round12Spec extends SparkSpec {
  import spark.implicits._

  test("bpeTrain learns the greedy argmax merges on a planted corpus") {
    // "a b a b c" + "a b c d": round 1 merges the 3-count "a b";
    // round 2 the 2-count "a_b c"; round 3 is a 1-1 tie broken
    // lexicographically (space < underscore, so "a_b a_b_c" wins);
    // round 4 merges the last bigram; round 5 finds none and stops.
    val docs = Seq((1L, "a b a b c"), (2L, "a b c d")).toDF("doc_id", "text")
    val m = TextOps.bpeTrain(docs, nMerges = 8)
      .orderBy("merge_rank")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq(
      (1L, "a b", "a_b", 3L),
      (2L, "a_b c", "a_b_c", 2L),
      (3L, "a_b a_b_c", "a_b_a_b_c", 1L),
      (4L, "a_b_c d", "a_b_c_d", 1L)),
      "greedy argmax merge sequence with early stop")
    graft.CacheTracker.releaseAll()
  }

  test("bpeTrain merges round-trip: un-merging restores the cleaned corpus") {
    assumeTestdata()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val merges = TextOps.bpeTrain(docs, nMerges = 4).orderBy("merge_rank")
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(merges.nonEmpty)
    // every new_token is its pair with the space replaced by '_', and
    // applying the merges in rank order then flattening '_' back to ' '
    // must reproduce the cleaned text exactly (merges never lose tokens)
    merges.foreach { case (pair, nt) => assert(nt === pair.replace(' ', '_')) }
    val cleaned = docs.select(TextOps.cleanText(col("text")).as("c"))
      .limit(50).collect().map(_.getString(0))
    for (c <- cleaned) {
      // pairs are [a-z_ ] only (cleaned tokens + merge underscores), so
      // the pair string is regex-safe as-is
      val merged = merges.foldLeft(c) { case (txt, (pair, nt)) =>
        txt.replaceAll("\\b" + pair + "\\b", nt)
      }
      assert(merged.replace('_', ' ') === c, s"round-trip failed for: $c")
    }
    graft.CacheTracker.releaseAll()
  }

  test("round-12 operators are total on empty inputs") {
    val noDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextOps.bpeTrain(noDocs).count() === 0)
    graft.CacheTracker.releaseAll()
  }
}
