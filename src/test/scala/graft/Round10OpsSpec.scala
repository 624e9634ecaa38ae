package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, LangModel, Similarity, TextOps}

/** Edge-case coverage for the round-10 operators; the value-exact path
  * is the DuckDB oracle in graft.Oracles. */
class Round10OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat", "en", "a", 22),
    (2L, "une phrase en francais 123", "fr", "b", 26),
    (3L, "", "fr", "b", 0),
    (4L, "word-piece splitting, e.g. 42 tokens!", "en", "a", 37),
    (5L, "der schnelle braune fuchs", "de", "c", 25)
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("corpusShuffle: ord is a 1..n bijection") {
    val ords = TextOps.corpusShuffle(docs).select("ord").as[Long].collect().sorted
    assert(ords.toSeq === (1L to 5L))
  }

  test("corpusShuffle: pure function of (doc_id, seed) — rerun and partition-count identical") {
    val a = TextOps.corpusShuffle(docs).select("doc_id", "ord").as[(Long, Long)].collect().toMap
    val b = TextOps.corpusShuffle(docs.repartition(7)).select("doc_id", "ord")
      .as[(Long, Long)].collect().toMap
    assert(a === b)
  }

  test("corpusShuffle: different seeds give different epoch orders") {
    val e0 = TextOps.corpusShuffle(docs, seed = 42).select("doc_id", "ord")
      .as[(Long, Long)].collect().toMap
    val e1 = TextOps.corpusShuffle(docs, seed = 43).select("doc_id", "ord")
      .as[(Long, Long)].collect().toMap
    assert(e0.keySet === e1.keySet)
    assert(e0 !== e1) // 5 ids agreeing on both md5 orders would be 1/120
  }

  test("tokenFertility: hand-checked sums and ratios per language") {
    val m = TextOps.tokenFertility(docs)
      .select("lang", "ws_words", "bpe_tokens", "chars")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // en: doc1 6 words/6 bpe + doc4 5 words/12 bpe ("word-piece" -> word,-,piece;
    // "splitting," -> splitting,,; "e.g." -> e,.,g,.; "42"; "tokens!" -> tokens,!)
    assert(m("en") === (("en", 11L, 18L, 59L)))
    // fr: doc2 5 words 5 bpe, doc3 empty contributes zeros
    assert(m("fr") === (("fr", 5L, 5L, 26L)))
    assert(m("de") === (("de", 4L, 4L, 25L)))
    val f = TextOps.tokenFertility(docs)
      .filter(col("lang") === "en").select("fertility").as[Double].head()
    assert(math.abs(f - math.rint(18.0 / 11.0 * 1e6) / 1e6) < 1e-9)
  }

  test("tokenFertility: all-empty-text language yields NULL ratios, not Infinity") {
    val only = Seq((9L, "", "xx", "s", 0L)).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextOps.tokenFertility(only).head()
    assert(r.getAs[Long]("ws_words") === 0L)
    assert(r.isNullAt(r.fieldIndex("fertility")))
    assert(r.isNullAt(r.fieldIndex("chars_per_token")))
  }

  test("survivorship: duplicates charged to the copy's source, keeper to the first") {
    val dup = Seq(
      (1L, "same text here", "a", "en", 14),
      (2L, "same text here", "b", "en", 14),  // copy in source b: loses to doc 1
      (3L, "unique one", "b", "en", 10),
      (4L, "same text here", "b", "en", 14)   // second copy in b
    ).toDF("doc_id", "text", "source", "lang", "n_chars")
    val m = Dedup.survivorship(dup)
      .select("source", "n_docs", "n_kept", "retention")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(m("a") === (("a", 1L, 1L, 1.0)))
    assert(m("b") === (("b", 3L, 1L, 0.333333)))
  }

  test("minhashBandTune: full grid, monotone in sim, threshold orders by rows-per-band") {
    val rows = Dedup.minhashBandTune(spark)
      .select("rows_per_band", "bands", "sim", "p_detect", "s_threshold")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.length === 8 * 19)
    assert(rows.forall { case (r, b, _, _, _) => r * b === 128L })
    // detection probability is monotone nondecreasing in sim within a config
    for (grp <- rows.groupBy(_._1).values) {
      val ps = grp.sortBy(_._3).map(_._4)
      assert(ps.zip(ps.tail).forall { case (x, y) => y >= x })
    }
    // more rows per band -> higher S-curve threshold (stricter config)
    val th = rows.groupBy(_._1).map { case (r, g) => r -> g.head._5 }.toSeq.sortBy(_._1).map(_._2)
    assert(th.zip(th.tail).forall { case (x, y) => y > x })
    // spot value: r=16, b=8, s=0.5 -> 1-(1-2^-16)^8 ~ 0.000122
    val p = rows.find(r => r._1 === 16L && r._3 === 0.5).get._4
    assert(math.abs(p - 0.000122) < 1e-6)
  }

  test("knBigram: hand-computed interpolated Kneser-Ney probabilities") {
    // corpus "a b a b" + "a c": cb = {(a,b):2, (b,a):1, (a,c):1};
    // c(a)=3 nf(a)=2; c(b)=1 nf(b)=1; np(a)=np(b)=np(c)=1; types=3
    val tiny = Seq((1L, "a b a b", "en", "s", 7), (2L, "a c", "en", "s", 3))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = LangModel.knBigram(tiny)
      .select("w1", "w2", "c_bigram", "c_w1", "p_kn")
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    assert(m.size === 3)
    // P(b|a) = 1.25/3 + 0.75*2/3 * 1/3 = 0.583333
    assert(m(("a", "b")) === (("a", "b", 2L, 3L, 0.583333)))
    // P(a|b) = 0.25/1 + 0.75*1/1 * 1/3 = 0.5
    assert(m(("b", "a")) === (("b", "a", 1L, 1L, 0.5)))
    // P(c|a) = 0.25/3 + 0.75*2/3 * 1/3 = 0.25
    assert(m(("a", "c")) === (("a", "c", 1L, 3L, 0.25)))
  }

  test("cdcChunks: chunks tile each document exactly, in order") {
    val words = (0 until 200).map(i => ("abcdefghij") (i % 10).toString * (1 + i % 7))
    val d = Seq((1L, words.mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val ch = Dedup.cdcChunks(d).select("chunk_id", "start_tok", "chunk_len")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(ch.map(_._3).sum === 200L)
    // each chunk starts where the previous ended
    val starts = ch.map(_._2)
    val ends = ch.map(c => c._2 + c._3)
    assert(starts.head === 0L && ends.last === 200L)
    assert(starts.tail.sameElements(ends.init))
  }

  test("cdcChunks: an insertion reshifts only chunks up to the next boundary") {
    val words = (0 until 200).map(i => ("abcdefghij") (i % 10).toString * (1 + i % 7))
    val a = Seq((1L, words.mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val b = Seq((2L, ("zzz" +: words).mkString(" "), "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    def hashes(df: org.apache.spark.sql.DataFrame) =
      Dedup.cdcChunks(df).select("chunk_hash").as[String].collect().toSeq
    val ha = hashes(a)
    val hb = hashes(b)
    // boundaries are content-defined, so hashing re-syncs after the first
    // boundary past the edit: most chunks survive a front insertion (a
    // fixed-window chunker shares ZERO chunks here — every window shifts)
    val shared = ha.intersect(hb).size
    assert(shared >= ha.size / 2, s"only $shared of ${ha.size} chunks survived the edit")
    assert(ha.size > 5) // the doc actually split into multiple chunks
  }

  test("lexiconScore: polarity from pos/neg hits, NULL on empty docs") {
    val d = Seq(
      (1L, "this is a good great day i love it", "en", "s", 0L),
      (2L, "bad bad terrible outcome", "en", "s", 0L),
      (3L, "", "en", "s", 0L),
      (4L, "neutral words only here", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = graft.ml.Sentiment.lexiconScore(d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(m(1L).getLong(2) === 3L && m(1L).getLong(3) === 0L) // good, great, love
    assert(math.abs(m(1L).getDouble(4) - 0.333333) < 1e-9)     // 3/9, 6dp
    assert(m(2L).getLong(2) === 0L && m(2L).getLong(3) === 3L) // bad x2, terrible
    assert(m(3L).isNullAt(4))                                  // empty: NULL not NaN
    assert(m(4L).getDouble(4) === 0.0)
  }

  test("simhashDetPairs: identical docs pair at hamming 0; disjoint docs do not pair") {
    val d = Seq(
      (1L, "alpha beta gamma delta epsilon zeta", "en", "s", 0L),
      (2L, "alpha beta gamma delta epsilon zeta", "en", "s", 0L), // exact copy
      (3L, "totally different words entirely here now", "en", "s", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val pairs = Dedup.simhashDetPairs(d)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.contains((1L, 2L, 0L)))
    assert(!pairs.exists(p => p._1 === 3L || p._2 === 3L))
    // deterministic: same result on a different partitioning
    val pairs2 = Dedup.simhashDetPairs(d.repartition(5))
      .select("a_id", "b_id", "hamming").as[(Long, Long, Long)].collect()
    assert(pairs.toSet === pairs2.toSet)
  }

  test("qualityDrift: a source matching the corpus has low D; a degenerate one is caught") {
    // source "good": healthy prose; source "junk": punctuation soup (low quality)
    val good = (0 until 30).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again", "en", "good", 0L))
    val junk = (100 until 115).map(i =>
      (i.toLong, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))", "en", "junk", 0L))
    val d = (good ++ junk).toDF("doc_id", "text", "lang", "source", "n_chars")
    val m = TextOps.qualityDrift(d).select("source", "n_docs", "ks_d")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    assert(m("good")._2 === 30L && m("junk")._2 === 15L)
    // junk's ECDF jumps to 1 in the lowest bins while the corpus is at 1/3
    assert(m("junk")._3 > 0.5)
    // good drifts from the corpus only by the junk fraction (<= 1/3)
    assert(m("good")._3 < m("junk")._3)
    // identical distributions: single-source corpus has zero drift
    val solo = TextOps.qualityDrift(good.toDF("doc_id", "text", "lang", "source", "n_chars"))
    assert(solo.select("ks_d").as[Double].head() === 0.0)
  }

  test("matryoshkaRecall: full-width truncation is the identity (recall 1.0)") {
    val emb = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.sin(i * 8 + j).toFloat), 0)
    }.toDF("vec_id", "embedding", "label")
    // dims = full width -> truncated ANN IS the exact ANN
    val full = Similarity.matryoshkaRecall(emb, dims = 8, maxQueryId = 5, k = 3)
      .select("q_id", "recall").as[(Long, Double)].collect().toMap
    assert(full.size === 5)
    assert(full.values.forall(_ === 1.0))
    // aggressive truncation can only lose recall, never exceed 1
    val tr = Similarity.matryoshkaRecall(emb, dims = 2, maxQueryId = 5, k = 3)
      .select("recall").as[Double].collect()
    assert(tr.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("packEfficiency: fill fraction accounts all tokens against bin capacity") {
    // four docs in one shard (ids % 8 == 0), 100 tokens each -> prefix
    // bins 0,0,0,1 at budget 256: 2 bins, 400 tokens, fill 400/512
    val word = "aa "
    val d = Seq(0L, 8L, 16L, 24L).map(i => (i, word * 100, "en", "s", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = TextOps.packEfficiency(d).head()
    assert(r.getAs[Long]("shard") === 0L)
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("total_tokens") === 400L)
    assert(r.getAs[Long]("n_bins") === 2L)
    assert(math.abs(r.getAs[Double]("fill_frac") - 0.78125) < 1e-9)
  }

  test("minhashCalibration: exact copies estimate 1.0 at zero error; est and jaccard bounded") {
    val base = (0 until 40).map(i => s"tok${('a' + i % 26).toChar} w${('a' + i % 7).toChar}").mkString(" ")
    val d = Seq(
      (1L, base, "en", "s", 0L),
      (2L, base, "en", "s", 0L),                       // exact copy of 1
      (3L, base.replace("toka", "tokz"), "en", "s", 0L) // near copy
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val rows = Dedup.minhashCalibration(d)
      .select("a_id", "b_id", "minhash_est", "jaccard", "abs_err")
      .as[(Long, Long, Double, Double, Double)].collect()
    val exact = rows.find(r => r._1 === 1L && r._2 === 2L).get
    assert(exact._3 === 1.0 && exact._4 === 1.0 && exact._5 === 0.0)
    assert(rows.forall(r => r._3 >= 0.0 && r._3 <= 1.0 && r._4 >= 0.0 && r._4 <= 1.0))
  }

  test("clusterStats: histogram of near-dup component sizes") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val m = Dedup.clusterStats(pairs)
      .select("cluster_size", "n_clusters").as[(Long, Long)].collect().toMap
    assert(m === Map(3L -> 1L, 2L -> 1L))
    // empty pair set: no clusters, not a crash
    assert(Dedup.clusterStats(pairs.limit(0)).count() === 0)
  }
}
