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
}
