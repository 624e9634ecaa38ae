package graft

import org.apache.spark.sql.functions._
import graft.operators.{LangModel, TextOps}

/** Edge-case coverage for the round-10 batch-C operators (weighted_sample,
  * shard_balance, curriculum_order, doc_oov_rate, heldout_perplexity);
  * the value-exact path is the DuckDB oracle in graft.Oracles. */
class Round10cSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat", "en", "a", 22L),
    (2L, "the cat sat on the hat again and again", "en", "a", 38L),
    (3L, "une phrase en francais", "fr", "b", 22L),
    (4L, "the dog sat on the mat", "en", "a", 22L),
    (5L, "der schnelle braune fuchs", "de", "c", 25L),
    (6L, "the cat and the dog sat", "en", "a", 23L),
    (7L, "completely novel vocabulary here", "en", "b", 32L),
    (8L, "the mat sat on the cat", "en", "a", 22L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("weightedSample: k bounds the result and rerun/partitioning changes nothing") {
    val a = TextOps.weightedSample(docs, k = 5).select("doc_id").as[Long].collect().toSet
    assert(a.size === 5)
    val b = TextOps.weightedSample(docs.repartition(7), k = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b)
  }

  test("weightedSample: k >= n returns the whole corpus") {
    assert(TextOps.weightedSample(docs, k = 100).count() === 8)
  }

  test("weightedSample: priorities follow the ES form ln(u)/w — all non-positive") {
    val keys = TextOps.weightedSample(docs, k = 8).select("skey").as[Double].collect()
    assert(keys.forall(_ <= 0.0)) // u in (0,1] so ln(u) <= 0
  }

  test("weightedSample: heavier docs win more often across seedless id-space") {
    // one long doc vs many short: the long doc's expected key ln(u)/w rises
    // with w, so across 200 ids the heavy docs should be over-represented
    // in the top-50 sample relative to their 1/4 population share
    val corpus = (1L to 200L).map(i =>
      (i, "x", "en", "s", if (i % 4 == 0) 1000L else 10L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val picked = TextOps.weightedSample(corpus, k = 50)
      .filter(col("n_chars") === 1000L).count()
    assert(picked > 25, s"heavy docs picked only $picked of 50") // fair share would be ~12
  }

  test("shardBalance: shards partition the corpus and totals are conserved") {
    val r = TextOps.shardBalance(docs, nShards = 8).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum === 8L)
    assert(r.map(_.getAs[Long]("sum_chars")).sum === docs.agg(sum("n_chars")).as[Long].head())
    assert(r.forall(x => { val s = x.getAs[Long]("shard"); s >= 0 && s < 8 }))
  }

  test("shardBalance: skew columns are zero-centered weighted deviations") {
    // sum over shards of (skew+1)*n_docs = nShards * total_docs / total_docs... check
    // directly: a perfectly uniform assignment would read skew 0; here just
    // pin the identity sum(n_docs * (skew_docs + 1)) == nShards * mean * ...
    val r = TextOps.shardBalance(docs, nShards = 4).collect()
    val t = r.map(_.getAs[Long]("n_docs")).sum.toDouble
    val weighted = r.map(x => x.getAs[Long]("n_docs") / t * (x.getAs[Double]("skew_docs") + 1.0)).sum
    // E_docs[skew+1] = nShards * sum(n_i^2)/t^2 >= 1 with equality iff uniform
    assert(weighted >= 1.0 - 1e-9)
  }

  test("curriculumOrder: ord is the total order by (n_chars, doc_id)") {
    val r = TextOps.curriculumOrder(docs).orderBy("ord")
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    val expected = docs.select("doc_id", "n_chars").as[(Long, Long)].collect()
      .sortBy(x => (x._2, x._1))
    assert(r.toSeq === expected.toSeq)
  }

  test("curriculumOrder: partition-count independent") {
    val a = TextOps.curriculumOrder(docs).select("doc_id", "ord").as[(Long, Long)].collect().toMap
    val b = TextOps.curriculumOrder(docs.repartition(5)).select("doc_id", "ord")
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("docOovRate: every token in-vocab when topN covers the whole vocabulary") {
    val r = TextOps.docOovRate(docs, topN = 1000)
    assert(r.filter(col("n_oov") =!= 0L).count() === 0)
  }

  test("docOovRate: hand-checked rates under a tiny head vocab") {
    // topN=2 head vocab by count desc, token asc: "the" (10) and "sat" (5)
    val r = TextOps.docOovRate(docs, topN = 2)
      .select("doc_id", "n_tokens", "n_oov").as[(Long, Long, Long)].collect()
      .map(x => x._1 -> ((x._2, x._3))).toMap
    assert(r(1L) === ((6L, 3L))) // the cat sat on the mat -> sat,on,mat OOV
    assert(r(7L) === ((4L, 4L))) // novel vocab: all OOV
    assert(r(3L)._2 === r(3L)._1) // french doc: fully OOV of the en head
  }

  test("docOovRate: empty-after-clean docs drop out (no divide-by-zero)") {
    val withEmpty = docs.union(Seq((99L, "12345 !!!", "en", "a", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val r = TextOps.docOovRate(withEmpty, topN = 2)
    assert(r.filter(col("doc_id") === 99L).count() === 0)
    assert(r.filter(col("oov_rate").isNull).count() === 0)
  }

  test("heldoutPerplexity: scores exactly the test split (doc_id % 4 == 3)") {
    val ids = LangModel.heldoutPerplexity(docs).select("doc_id").as[Long].collect().toSet
    assert(ids.subsetOf(Set(3L, 7L)))
    assert(ids.contains(3L))
  }

  test("heldoutPerplexity: fully-OOV test doc gets n_oov == n_bigrams and nll = -ln(1/V)") {
    val r = LangModel.heldoutPerplexity(docs)
      .filter(col("doc_id") === 7L).head()
    assert(r.getAs[Long]("n_oov") === r.getAs[Long]("n_bigrams"))
    // unseen w1: p = (0 + 0.5)/(0 + 0.5 V) = 1/V for every bigram, so
    // nll = ln(V); train vocab = distinct tokens over train docs
    val v = docs.filter(pmod(col("doc_id"), lit(4)) < 3)
      .select(explode(TextOps.tokens(col("text"))).as("t"))
      .agg(countDistinct(col("t"))).as[Long].head()
    assert(math.abs(r.getAs[Double]("nll") - math.rint(math.log(v.toDouble) * 1e6) / 1e6) < 2e-6)
  }

  test("heldoutPerplexity: nll strictly positive (every smoothed prob < 1)") {
    // logp = ln((c+0.5)/(c_w1+0.5V)) < 0 because c <= c_w1 and V > 1,
    // so nll = -mean(logp) > 0 for every test doc
    val out = LangModel.heldoutPerplexity(docs).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Double]("nll") > 0.0))
  }

  test("heldoutPerplexity: partition-count independent") {
    val a = LangModel.heldoutPerplexity(docs).select("doc_id", "nll").as[(Long, Double)].collect().toMap
    val b = LangModel.heldoutPerplexity(docs.repartition(6)).select("doc_id", "nll")
      .as[(Long, Double)].collect().toMap
    assert(a === b)
  }

  // --- mixture_epoch (B122) ---

  private lazy val mixDocs = (1L to 40L).map { i =>
    // src0 (weight 3) gets 30 docs, src1 (weight 1) gets 10
    (i, "text", "en", if (i <= 30) "src0" else "src1", 10L)
  }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("mixtureEpoch: epoch_pos is a 1..n bijection and keeps every doc") {
    val r = TextOps.mixtureEpoch(mixDocs).select("epoch_pos").as[Long].collect().sorted
    assert(r.toSeq === (1L to 40L))
  }

  test("mixtureEpoch: every window of the stream is ~weight-proportional") {
    // weight 3 source with 30 docs vs weight 1 with 10: both exhaust at
    // pos 10, so each quarter of the epoch should hold ~3:1 composition
    val r = TextOps.mixtureEpoch(mixDocs)
      .select("epoch_pos", "source").as[(Long, String)].collect().sortBy(_._1)
    for (q <- 0 until 4) {
      val slice = r.slice(q * 10, (q + 1) * 10)
      val heavy = slice.count(_._2 == "src0")
      assert(heavy >= 6 && heavy <= 8, s"quarter $q carried $heavy/10 heavy docs")
    }
  }

  test("mixtureEpoch: stride positions interleave, never block-concatenate") {
    // first 4 positions must not all come from one source
    val first4 = TextOps.mixtureEpoch(mixDocs).orderBy("epoch_pos").limit(4)
      .select("source").as[String].collect().toSet
    assert(first4.size === 2)
  }

  test("mixtureEpoch: partition-count independent") {
    val a = TextOps.mixtureEpoch(mixDocs).select("doc_id", "epoch_pos")
      .as[(Long, Long)].collect().toMap
    val b = TextOps.mixtureEpoch(mixDocs.repartition(7)).select("doc_id", "epoch_pos")
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  // --- dedup_threshold_sweep (B123) ---

  private lazy val dupDocs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 40L),
    (2L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s", 40L), // exact copy of 1
    (3L, "alpha beta gamma delta epsilon zeta iota kappa", "en", "s", 40L), // near copy
    (4L, "totally different words entirely here now really yes", "en", "s", 50L)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("thresholdSweep: monotone non-increasing in the threshold") {
    val r = graft.operators.Dedup.thresholdSweep(dupDocs)
      .orderBy("t_pct").select("t_pct", "n_pairs", "n_docs")
      .as[(Long, Long, Long)].collect()
    assert(r.nonEmpty)
    for (Array(a, b) <- r.sliding(2).map(_.toArray)) {
      assert(a._2 >= b._2, s"n_pairs rose from t=${a._1} to ${b._1}")
      assert(a._3 >= b._3, s"n_docs rose from t=${a._1} to ${b._1}")
    }
  }

  test("thresholdSweep: exact copies survive every threshold, near copies only low ones") {
    val r = graft.operators.Dedup.thresholdSweep(dupDocs)
      .select("t_pct", "n_pairs").as[(Long, Long)].collect().toMap
    assert(r(90L) === 1L) // only the exact pair (1,2) at jaccard 1.0
    assert(r.getOrElse(10L, 0L) >= 2L) // near pair joins at low thresholds
  }

  test("thresholdSweep: dup-free corpus yields an empty curve, not zero rows per bin") {
    val clean = Seq(
      (1L, "alpha beta gamma delta", "en", "s", 20L),
      (2L, "epsilon zeta eta theta", "en", "s", 20L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.operators.Dedup.thresholdSweep(clean).count() === 0)
  }

  // --- corpus_summary (B124) ---

  test("corpusSummary: hand-checked card on a tiny corpus") {
    val tiny = Seq(
      (1L, "the cat sat", "en", "a", 11L),
      (2L, "the cat sat", "en", "b", 11L), // exact dup of 1
      (3L, "une phrase", "fr", "a", 10L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = TextOps.corpusSummary(tiny).as[(String, Double)].collect().toMap
    assert(m("n_docs") === 3.0)
    assert(m("n_langs") === 2.0)
    assert(m("n_sources") === 2.0)
    assert(m("n_tokens") === 8.0)
    assert(m("n_token_types") === 5.0)
    assert(m("max_chars") === 11.0)
    assert(m("min_chars") === 10.0)
    assert(math.abs(m("mean_doc_tokens") - math.rint(8.0 / 3.0 * 1e6) / 1e6) < 1e-9)
    // 2 distinct hashes over 3 docs -> dup rate 1/3
    assert(math.abs(m("exact_dup_rate") - math.rint(1.0 / 3.0 * 1e6) / 1e6) < 1e-9)
    assert(m("head10_coverage") === 1.0) // 5 types <= 10 head slots
  }

  test("corpusSummary: total on an empty corpus — 10 stat rows, zero counts, NULL ratios") {
    val empty = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextOps.corpusSummary(empty).collect()
    assert(rows.length === 10)
    val m = rows.map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(m("n_docs") === Some(0.0))
    assert(m("n_tokens") === Some(0.0))
    assert(m("mean_doc_tokens") === None) // nullif guard, not a crash
    assert(m("exact_dup_rate") === None)
  }

  // --- filter_attrition (B125) ---

  test("filterAttrition: hand-checked counts with overlapping rejections") {
    val corpus = Seq(
      // long, clean, non-repetitive: passes everything (stopwords keep quality up)
      (1L, "the quick brown fox jumps over a lazy dog while it is a fine day today and the sun shines on many green things here by the old mill stream", "en", "a", 200L),
      // short AND duplicate of doc 4's text: overlap => not counted in either only-column
      (2L, "the tiny dup", "en", "a", 12L),
      // short only
      (3L, "the lone short", "en", "a", 14L),
      // duplicate keeper (min doc_id wins, so doc 2 is the dup... ids: 2 < 4, so 4 is the dup)
      (4L, "the tiny dup", "en", "a", 12L),
      // repetition soup AND short: again again again... (rep > 3)
      (5L, "again again again again the the the the again again again again", "en", "a", 64L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = TextOps.filterAttrition(corpus)
      .select("filter", "n_fail", "n_fail_only")
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // short: docs 2,3,4,5 (n_chars < 100). quality: none (all have stopwords).
    assert(m("short") === ((4L, 2L)))      // only doc 3 and... 2? doc2 is short+keeper(not dup)->only; 3 only; 4 short+dup; 5 short+rep => only = {2,3}
    assert(m("duplicate") === ((1L, 0L)))  // doc 4 (dup of 2), also short => never only
    assert(m("repetition")._1 === 1L)      // doc 5
    assert(m("repetition")._2 === 0L)      // doc 5 also short
    assert(m("any") === ((4L, 4L)))        // docs 2,3,4,5
  }

  test("filterAttrition: total on an empty corpus — 5 rows, zero counts, NULL rates") {
    val empty = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = TextOps.filterAttrition(empty).collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getAs[Long]("n_fail") === 0L))
    assert(rows.forall(_.isNullAt(3))) // fail_rate NULL via nullif, not NaN
  }

  // --- k_anonymity (B126) ---

  test("kAnonymity: flags only groups under k, with exact bucket edges") {
    val corpus = (1L to 12L).map { i =>
      // 6 docs in (en, a, bucket 1) [n_chars 100..199], 6 spread thin
      if (i <= 6) (i, "t", "en", "a", 100L + i)
      else (i, "t", "fr", s"s$i", 250L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextOps.kAnonymity(corpus, k = 5)
      .select("lang", "source", "len_bucket", "n_docs")
      .as[(String, String, Long, Long)].collect()
    // the 6-doc (en, a, 1) group is k-anonymous at k=5; the singletons are not
    assert(!r.exists(_._1 == "en"))
    assert(r.count(_._1 == "fr") === 6)
    assert(r.forall(_._4 < 5))
    assert(r.forall(x => x._1 == "fr" && x._3 === 2L)) // 250 div 100 = 2
  }

  test("kAnonymity: empty corpus yields an empty audit") {
    val empty = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(TextOps.kAnonymity(empty).count() === 0)
  }

  // --- doc_embed_hash (B127) ---

  test("docEmbedHash: identical documents embed identically, different ones differ") {
    val corpus = Seq(
      (1L, "the cat sat on the mat", "en", "a", 22L),
      (2L, "the cat sat on the mat", "en", "b", 22L),
      (3L, "a completely different sentence here", "en", "a", 36L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val v = graft.operators.TfIdf.docEmbedHash(corpus)
      .select("doc_id", "dim", "v").as[(Long, Long, Double)].collect()
      .groupBy(_._1).map { case (id, xs) => id -> xs.sortBy(_._2).map(_._3).toSeq }
    assert(v(1L) === v(2L))
    assert(v(1L) !== v(3L))
    assert(v(1L).size === 16)
  }

  test("docEmbedHash: partition-count independent (sorted fold)") {
    val a = graft.operators.TfIdf.docEmbedHash(dupDocs).select("doc_id", "dim", "v")
      .as[(Long, Long, Double)].collect().toSet
    val b = graft.operators.TfIdf.docEmbedHash(dupDocs.repartition(7))
      .select("doc_id", "dim", "v").as[(Long, Long, Double)].collect().toSet
    assert(a === b)
  }

  test("docEmbedHash: empty corpus embeds to nothing") {
    val empty = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.operators.TfIdf.docEmbedHash(empty).count() === 0)
  }

  // --- text_ann (B128) ---

  test("textAnn: an exact text copy is its query's nearest neighbor at cos 1") {
    val corpus = Seq(
      (1L, "the cat sat on the mat today", "en", "a", 28L),
      (50L, "the cat sat on the mat today", "en", "b", 28L), // copy of query 1
      (51L, "une phrase en francais ici maintenant", "fr", "b", 37L),
      (52L, "der schnelle braune fuchs springt", "de", "c", 33L),
      (53L, "batch window agg scan filter merge", "en", "a", 34L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val top = graft.operators.Similarity.textAnn(corpus, maxQueryId = 10, k = 2)
      .filter(col("q_id") === 1L).orderBy("rnk")
      .select("n_id", "cos").as[(Long, Double)].collect()
    assert(top.head._1 === 50L)
    assert(top.head._2 === 1.0)
  }

  test("textAnn: total on an empty corpus") {
    val empty = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    assert(graft.operators.Similarity.textAnn(empty).count() === 0)
  }

  test("filterAttrition: null text rows reject on quality, not crash") {
    val withNull = Seq(
      (1L, Option("the quick brown fox jumps over a lazy dog while it is a fine day today and the sun shines on many green things here by the old mill stream"), Option("en"), Option("a"), Option(200L)),
      (2L, None: Option[String], Option("en"), Option("a"), None: Option[Long])
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = TextOps.filterAttrition(withNull)
      .select("filter", "n_fail").as[(String, Long)].collect().toMap
    assert(m("quality") === 1L) // the null-text doc
    assert(m("any") === 1L)
  }
}
