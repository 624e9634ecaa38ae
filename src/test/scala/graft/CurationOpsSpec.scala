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

  // The synthetic corpus contains no PII, so the oracle only proves the
  // regexes don't false-positive; true positives are value-checked here.
  test("piiRedact: redacts emails, IPs, phones in order, with counts") {
    val docs = Seq(
      (1L, "mail bob@example.com and alice.smith@sub.domain.org today"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 responded"),
      (3L, "call +1 555 123-4567 maybe"),
      (4L, "ip 10.0.0.1 then phone 555-123-4567"),
      (5L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val m = TextOps.piiRedact(docs)
      .select("doc_id", "redacted", "n_emails", "n_ips", "n_phones")
      .as[(Long, String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(m(1L)._2 === "mail <EMAIL> and <EMAIL> today")
    assert((m(1L)._3, m(1L)._4, m(1L)._5) === ((2L, 0L, 0L)))
    assert(m(2L)._2 === "server at <IP> and <IP> responded")
    assert((m(2L)._3, m(2L)._4, m(2L)._5) === ((0L, 2L, 0L)))
    assert(m(3L)._2 === "call <PHONE> maybe")
    assert((m(3L)._3, m(3L)._4, m(3L)._5) === ((0L, 0L, 1L)))
    // the IP is consumed by the IP stage and NOT recounted as a phone
    assert(m(4L)._2 === "ip <IP> then phone <PHONE>")
    assert((m(4L)._3, m(4L)._4, m(4L)._5) === ((0L, 1L, 1L)))
    assert(m(5L)._2 === "nothing sensitive here")
    assert((m(5L)._3, m(5L)._4, m(5L)._5) === ((0L, 0L, 0L)))
  }

  test("rangeJoin: binned join matches the naive range predicate exactly") {
    val left = Seq((1L, 10L, 1000L), (2L, 10L, 5000L), (3L, 20L, 900L))
      .toDF("event_id", "user_id", "us")
    val right = Seq(
      (101L, 10L, 0L), (102L, 10L, 999L), (103L, 10L, 1000L),
      (104L, 10L, 4500L), (105L, 20L, 899L), (106L, 20L, 901L), (107L, 30L, 900L)
    ).toDF("r_id", "user_id", "r_us")
    val got = Relational.rangeJoin(left, right, "user_id", "us", "r_us", windowUs = 1000L)
      .select("event_id", "r_id").as[(Long, Long)].collect().toSet
    val want = left.as("l").join(right.as("r"),
        col("l.user_id") === col("r.user_id") &&
          col("r_us") >= col("us") - 1000L && col("r_us") <= col("us"))
      .select("event_id", "r_id").as[(Long, Long)].collect().toSet
    assert(got === want)
    assert(got === Set((1L, 101L), (1L, 102L), (1L, 103L), (2L, 104L), (3L, 105L)))
  }

  test("contamination: counts distinct shared 4-grams against the benchmark slice") {
    val docs2 = Seq(
      (50L, "alpha beta gamma delta epsilon", "en", "a", 0),  // benchmark (id%50==0)
      (1L, "alpha beta gamma delta zeta", "en", "a", 0),       // shares 1 shingle
      (2L, "alpha beta gamma delta epsilon tail", "en", "a", 0), // shares 2
      (3L, "unrelated words only here now", "en", "a", 0)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = TextOps.contamination(docs2)
      .select("doc_id", "n_shared", "n_bench_docs")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(m === Map(1L -> ((1L, 1L)), 2L -> ((2L, 1L))))
  }

  test("tokenHistogram: integer log2 bucketing at exact powers of two") {
    val docs2 = (1 to 8).map(i => (i.toLong, "eight", "en", "a", 5)) ++
      Seq((9L, "once", "en", "a", 4), (10L, "three three three", "en", "a", 17))
    val out = TextOps.tokenHistogram(
        docs2.toDF("doc_id", "text", "lang", "source", "n_chars"))
      .select("bucket", "n_tokens", "n_occurrences")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // "eight" x8 -> bucket 3; "once" x1 -> bucket 0; "three" x3 -> bucket 1
    assert(out === Map(3L -> ((1L, 8L)), 0L -> ((1L, 1L)), 1L -> ((1L, 3L))))
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

  test("dedup keep-best retains the highest-quality duplicate, not the first") {
    // docs 10 and 11 clean to the same text; 11 is longer raw (higher
    // quality composite via the length term), so 11 must win despite 10's
    // smaller id. doc 12 is unique and survives untouched.
    val d = Seq(
      (10L, "same words here", "en", "a", 15),
      (11L, "same words here and padding to pass the length gate", "en", "a", 51),
      (12L, "completely different", "fr", "b", 20))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // make 10 and 11 collide: same cleaned content requires same text, so
    // instead verify the policy on true duplicates with differing quality
    // via punctuation (stripped by cleaning, but penalized by the score)
    val dd = Seq(
      (10L, "!!!! same words here once more ok", "en", "a", 33),
      (11L, "same words here once more ok", "en", "a", 28),
      (12L, "completely different", "fr", "b", 20))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val kept = TextOps.dedupKeepBest(dd).collect().map(_.getLong(0)).toSet
    assert(kept === Set(11L, 12L),
      "punctuation-free duplicate outscores the earlier noisy one")
  }

  test("bpe merge step merges exactly the most frequent adjacent pair") {
    val d = Seq(
      (1L, "big data big data big data", "en", "a", 26),
      (2L, "big data pipelines", "en", "a", 18),
      (3L, "small data", "en", "a", 10))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = TextOps.bpeMergeStep(d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3))).toSeq
    assert(out.forall(_._2 == "big data"), "argmax pair is (big, data): 4 occurrences")
    assert(out.forall(_._3 == 4L))
    val merged = out.map(t => t._1 -> t._4).toMap
    assert(merged(1L) === "big_data big_data big_data")
    assert(merged(2L) === "big_data pipelines")
    assert(merged(3L) === "small data", "non-matching docs pass through")
    // overlap semantics: leftmost non-overlapping
    val tricky = Seq((1L, "a a a", "en", "a", 5)).toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextOps.bpeMergeStep(tricky).collect().head.getString(3) === "a_a a")
  }

  test("approx percentile sketch is rank-accurate within 2% of the group size") {
    // the sketch returns an actual element with bounded RANK error (value
    // error is unbounded when neighboring order statistics are far apart)
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val approx = TextOps.approxCharPercentiles(docs).collect()
      .map(r => r.getString(0) -> Seq(
        0.25 -> r.getLong(2), 0.5 -> r.getLong(3),
        0.75 -> r.getLong(4), 0.95 -> r.getLong(5))).toMap
    val byLang = docs.select("lang", "n_chars")
      .as[(String, Long)].collect().groupBy(_._1)
      .map { case (l, vs) => l -> vs.map(_._2).sorted }
    assert(approx.keySet === byLang.keySet)
    for (lang <- approx.keySet; (q, a) <- approx(lang)) {
      val vs = byLang(lang)
      val rank = vs.count(_ <= a).toDouble / vs.length
      val rankBelow = vs.count(_ < a).toDouble / vs.length
      assert(rankBelow - 0.02 <= q && q <= rank + 0.02,
        s"$lang p$q: sketch value $a spans ranks [$rankBelow, $rank]")
    }
  }
}
