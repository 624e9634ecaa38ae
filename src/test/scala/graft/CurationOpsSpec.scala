package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Similarity, TextOps}

/** Edge-case coverage for the round-3 curation/analytics operators; the
  * value-exact path is the DuckDB oracle in graft.Oracles. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat the cat sat", "en", "a", 34),
    (2L, "word", "en", "a", 4),                  // single token: no bigrams
    (3L, "", "fr", "b", 0),                      // empty: zero tokens
    (4L, "x y x y x y x y x y", "fr", "b", 19)   // degenerate repetition
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("repetitionStats: every doc appears; empty/singleton docs get zeros") {
    val m = TextOps.repetitionStats(docs)
      .select("doc_id", "n_tokens", "top_bigram_n", "top_bigram_frac")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(m.size === 4)
    assert(m(2L) === ((2L, 1L, 0L, 0.0)))
    assert(m(3L) === ((3L, 0L, 0L, 0.0)))
    // "x y" appears 5 times out of 9 bigrams
    assert(m(4L)._3 === 5L)
    assert(math.abs(m(4L)._4 - 5.0 / 9.0) < 1e-6)
  }

  test("repetitionStats: distinct ratio reflects vocabulary collapse") {
    val m = TextOps.repetitionStats(docs)
      .select("doc_id", "n_distinct").as[(Long, Long)].collect().toMap
    assert(m(4L) === 2L)  // only {x, y}
    assert(m(1L) === 5L)  // {the, cat, sat, on, mat}
  }

  test("gopherFilter: each rule fails independently") {
    val out = TextOps.gopherFilter(docs)
      .select("doc_id", "ok_len", "ok_stop", "kept")
      .as[(Long, Boolean, Boolean, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(1L) === ((1L, true, true, true)))   // passes everything
    assert(out(2L)._2 === false)                   // too short
    assert(out(3L)._4 === false)                   // empty never kept
    assert(out(4L)._3 === false)                   // no stopwords
  }

  test("stratifiedSample: deterministic and rate-monotone") {
    val s25 = TextOps.stratifiedSample(docs, 25).select("doc_id").as[Long].collect().toSet
    assert(TextOps.stratifiedSample(docs, 25).select("doc_id").as[Long].collect().toSet === s25)
    val s80 = TextOps.stratifiedSample(docs, 80).select("doc_id").as[Long].collect().toSet
    assert(s25.subsetOf(s80)) // same hash, larger cut
    assert(TextOps.stratifiedSample(docs, 100).count() === 4)
  }

  test("invertedIndex: df counts docs once, postings sorted and capped") {
    val m = TextOps.invertedIndex(docs, maxPostings = 1)
      .select("token", "df", "postings").as[(String, Long, String)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m("the") === ((1L, "1")))  // repeated within doc 1: df = 1
    assert(m("x") === ((1L, "4")))
    val full = TextOps.invertedIndex(docs, maxPostings = 10)
      .filter($"token" === "cat").select("postings").as[String].head()
    assert(full === "1")
  }

  test("rollupStats: subtotal levels are consistent") {
    val out = Relational.rollupStats(docs)
      .select("gid", "n_docs").as[(Long, Long)].collect()
    assert(out.count(_._1 === 0L) === 2)              // (lang, source) leaves
    assert(out.filter(_._1 === 1L).map(_._2).sorted === Seq(2L, 2L)) // per-lang
    assert(out.filter(_._1 === 3L).map(_._2).toSeq === Seq(4L))      // grand total
  }

  test("pivotEvents: absent combinations are 0, not null") {
    val ev = Seq((1L, "click", 1.0), (1L, "click", 2.0), (2L, "view", 3.0))
      .toDF("user_id", "event_type", "value")
    val m = Relational.pivotEvents(ev)
      .select("user_id", "click_n", "view_n", "click_cents")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(m(1L) === ((1L, 2L, 0L, 300L)))
    assert(m(2L) === ((2L, 0L, 1L, 0L)))
  }

  test("sequencePack: bins never start past the budget, prefix sums are per-shard") {
    val many = (0L until 40L).map(i => (i, "a b c d e f g h", "en", "a", 15))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.sequencePack(many, budget = 16, shards = 4)
      .select("doc_id", "shard", "prefix_tokens", "bin")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.length === 40)
    // 8 tokens per doc, budget 16 -> two docs per bin within each shard
    out.foreach { case (id, shard, prefix, bin) =>
      assert(shard === id % 4)
      assert(bin === prefix / 16)
    }
    val binSizes = out.groupBy(r => (r._2, r._4)).values.map(_.length)
    assert(binSizes.forall(_ === 2))
  }

  test("vocabBuild: dense ids by frequency, tail maps to OOV 0") {
    val out = TextOps.vocabBuild(docs, minDf = 2)
      .select("token", "df", "vocab_id").as[(String, Long, Long)].collect()
    val vocab = out.filter(_._3 > 0)
    assert(vocab.map(_._3).sorted.toSeq === (1L to vocab.length).toSeq) // dense
    assert(out.filter(_._2 < 2).forall(_._3 === 0L))                    // OOV
    // highest-df token gets id 1
    assert(out.maxBy(r => (r._2, r._1))._3 <= vocab.length)
  }

  // The sf0.01 oracle run sees 0 customers without orders (0 rows == 0
  // rows is vacuous), so the left-anti semantics are value-checked here.
  test("customersWithoutOrders: counts only customers lacking any order") {
    val customer = Seq(
      (1L, 10L), (2L, 10L), (3L, 20L), (4L, 20L), (5L, 20L)
    ).toDF("c_custkey", "c_nationkey")
    val orders = Seq((100L, 1L), (101L, 1L), (102L, 3L))
      .toDF("o_orderkey", "o_custkey")
    val nation = Seq((10L, "ALPHA"), (20L, "BETA")).toDF("n_nationkey", "n_name")
    val m = Relational.customersWithoutOrders(customer, orders, nation)
      .as[(String, Long)].collect().toMap
    assert(m === Map("ALPHA" -> 1L, "BETA" -> 2L)) // custkeys 2, 4, 5
  }

  test("embedCentroids: sorted-fold mean equals the plain mean") {
    val emb = Seq(
      (1L, Seq(1.0f, 2.0f), 0),
      (2L, Seq(3.0f, 4.0f), 0),
      (3L, Seq(10.0f, 20.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val m = Similarity.embedCentroids(emb)
      .select("label", "dim", "centroid").as[(Int, Long, Double)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(m((0, 1L)) === 2.0)
    assert(m((0, 2L)) === 3.0)
    assert(m((1, 2L)) === 20.0)
  }
}
