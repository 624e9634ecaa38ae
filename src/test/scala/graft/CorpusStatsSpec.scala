package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.TextOps

/** Round-5 corpus-analysis operators: unicode normalization,
  * line-frequency boilerplate removal, per-source caps, fertility /
  * robust-length / regression statistics. */
class CorpusStatsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("text")
      .select(GraftFunctions.normalize(col("text")).as[String]).head()

  test("graft_normalize strips Latin accents and recomposes") {
    assert(norm("café ångström naïve") === "cafe angstrom naive")
    assert(norm("tschüß señor fiancée") === "tschuß senor fiancee")
  }

  test("graft_normalize is identity on pure ASCII") {
    assert(norm("plain ascii text 123 !?") === "plain ascii text 123 !?")
  }

  test("graft_normalize handles empty and combining-mark-only input") {
    assert(norm("") === "")
    // e + combining acute (decomposed input) -> accent stripped
    assert(norm("é") === "e")
  }

  test("graft_normalize registered as SQL function") {
    GraftFunctions.register(spark)
    assert(spark.sql("SELECT graft_normalize('über') AS n").as[String].head() === "uber")
  }

  test("lineFreqFilter drops windows shared by >= minDocs docs, keeps rarer ones") {
    val boiler = (1 to 8).map(i => s"common$i").mkString(" ")   // one full window
    val docs = Seq(
      (1L, s"$boiler alpha beta gamma delta epsilon zeta eta theta"),
      (2L, s"$boiler iota kappa lambda mu nu xi omicron pi"),
      (3L, s"$boiler rho sigma tau upsilon phi chi psi omega"),
      (4L, "solo text that nobody repeats anywhere at all ok")
    ).toDF("doc_id", "text")
    val out = TextOps.lineFreqFilter(docs, win = 8, minDocs = 3)
      .orderBy("doc_id")
      .select("doc_id", "n_chunks", "n_dropped", "filtered_text")
      .as[(Long, Long, Long, String)].collect()
    // the boilerplate window appears in docs 1-3 -> dropped from ALL of them
    assert(out(0) === ((1L, 2L, 1L, "alpha beta gamma delta epsilon zeta eta theta")))
    assert(out(1)._3 === 1L && out(1)._4.startsWith("iota"))
    assert(out(2)._3 === 1L && out(2)._4.startsWith("rho"))
    // doc 4's windows (8 tokens + the 1-token tail) are unique -> fully kept
    assert(out(3) === ((4L, 2L, 0L, "solo text that nobody repeats anywhere at all ok")))
  }

  test("domainCap keeps exactly k docs per source, longest first") {
    val docs = (1L to 30L).map(i => (i, if (i <= 25) "a" else "b", 1000 - i.toInt))
      .toDF("doc_id", "source", "n_chars")
    val out = TextOps.domainCap(docs, k = 5)
    assert(out.count() === 10) // 5 from "a" (25 candidates), 5 from "b"
    val aTop = out.filter($"source" === "a").orderBy($"rnk")
      .select($"doc_id").as[Long].collect()
    assert(aTop === Array(1L, 2L, 3L, 4L, 5L)) // largest n_chars first
  }

  test("compressionRatio: hand-computed single source") {
    // "ab cd" -> len 5, 2 tokens, 1 space: cpt 2.5, wsr 0.2
    val docs = Seq((1L, "s1", "ab cd")).toDF("doc_id", "source", "text")
    val r = TextOps.compressionRatio(docs)
      .select("n_docs", "chars_per_token", "ws_ratio")
      .as[(Long, Double, Double)].head()
    assert(r === ((1L, 2.5, 0.2)))
  }

  test("lengthMad: interpolated median and MAD") {
    // n_chars 10,20,40,100 -> median 30.0; devs 20,10,10,70 -> MAD 15.0
    val docs = Seq((1L, "en", 10), (2L, "en", 20), (3L, "en", 40), (4L, "en", 100))
      .toDF("doc_id", "lang", "n_chars")
    val r = TextOps.lengthMad(docs)
      .select("n_docs", "med_chars", "mad_chars").as[(Long, Double, Double)].head()
    assert(r === ((4L, 30.0, 15.0)))
  }

  test("minhashLshPairs finds exact duplicates at jac 1.0, skips dissimilar docs") {
    val shared = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, shared), (2L, shared),                       // exact dup pair
      (3L, (21 to 40).map(i => s"other$i").mkString(" ")) // unrelated
    ).toDF("doc_id", "text")
    val pairs = graft.operators.Dedup.minhashLshPairs(docs)
      .as[(Long, Long, Double)].collect().toSet
    assert(pairs === Set((1L, 2L, 1.0)))
  }

  test("minhashLshPairs gates on exact shingle jaccard, not just band collision") {
    // one token changed out of 20 kills 3 of 18 shingles: jac ~= 0.71 < 0.9
    val base = (1 to 20).map(i => s"tok$i")
    val perturbed = base.updated(10, "changed")
    val docs = Seq((1L, base.mkString(" ")), (2L, perturbed.mkString(" ")))
      .toDF("doc_id", "text")
    assert(graft.operators.Dedup.minhashLshPairs(docs).count() === 0)
  }

  test("bigramLm: hand-computed smoothed conditionals") {
    // corpus "a b a b" + "b a": bigrams (a,b)x2, (b,a)x2; V = 2
    val docs = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")
    val r = graft.operators.LangModel.bigramLm(docs)
      .orderBy("w1", "w2")
      .select("w1", "w2", "c_bigram", "c_w1", "logp")
      .as[(String, String, Long, Long, Double)].collect()
    val exp = BigDecimal(math.log(2.5 / 3.0)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.toSeq === Seq(("a", "b", 2L, 2L, exp), ("b", "a", 2L, 2L, exp)))
  }

  test("rrfFusion fuses two rankings deterministically") {
    val docs = Seq(
      (1L, "data table data table and the of to in is"),  // query hits + stopwords
      (2L, "scan row merge batch window filter and the"),
      (3L, "data data data table table and of the is it")
    ).toDF("doc_id", "text").withColumn("lang", lit("en"))
    val out = graft.operators.LangModel.rrfFusion(docs)
      .select("doc_id", "r_bm25", "r_quality", "rrf")
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length === 3)
    // every rank appears exactly once per signal
    assert(out.map(_._2).sorted === Array(1L, 2L, 3L))
    assert(out.map(_._3).sorted === Array(1L, 2L, 3L))
    // rrf is exactly the closed form of the two ranks
    out.foreach { case (_, r1, r2, rrf) =>
      val exp = BigDecimal(1.0 / (60 + r1) + 1.0 / (60 + r2))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rrf === exp)
    }
    // doc 2 has no query tokens -> must rank last on bm25
    assert(out.find(_._1 == 2L).get._2 === 3L)
  }

  test("semanticDedup keeps the most central vector per sign bucket") {
    // bucket "11": v1 = (1,1), v2 = (1,0.9), v3 = (0.2, 1) — centroid
    // leans toward the diagonal; v1 (exactly diagonal) is most central.
    // bucket "01": single member keeps itself at cos 1.0.
    val emb = Seq(
      (1L, Array(1.0f, 1.0f)), (2L, Array(1.0f, 0.9f)), (3L, Array(0.2f, 1.0f)),
      (4L, Array(-1.0f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.semanticDedup(emb, bits = 2)
      .orderBy("bucket")
      .select("bucket", "keeper_id", "n_vecs").as[(String, Long, Long)].collect()
    assert(out.toSeq === Seq(("01", 4L, 1L), ("11", 1L, 3L)))
  }

  test("importanceWeights: target-like docs score higher than off-target docs") {
    val docs = Seq(
      (1L, "en", "alpha beta alpha beta gamma"),
      (2L, "en", "alpha beta gamma alpha beta"),
      (3L, "fr", "delta epsilon delta epsilon zeta"),
      (4L, "fr", "delta zeta epsilon delta epsilon")
    ).toDF("doc_id", "lang", "text")
    val w = graft.operators.LangModel.importanceWeights(docs, targetLang = "en")
      .select("doc_id", "log_ratio").as[(Long, Double)].collect().toMap
    assert(w(1L) > w(3L) && w(2L) > w(4L),
      s"en docs must out-score fr docs under the en-target LM: $w")
    assert(w.values.forall(v => !v.isNaN && !v.isInfinite))
  }

  test("winnowFingerprint: identical text -> identical digest; window cuts count") {
    val text = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, text), (2L, text),
      (3L, "completely different content with many unrelated words inside"),
      (4L, "too short")  // below the k+win-1 floor -> excluded
    ).toDF("doc_id", "text")
    val out = graft.operators.TextOps.winnowFingerprint(docs)
      .select("doc_id", "n_shingles", "n_fingerprints", "digest")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L))
    assert(out(0)._4 === out(1)._4, "identical docs must share the digest")
    assert(out(0)._4 !== out(2)._4)
    // winnowing keeps at most one fingerprint per window start
    out.foreach { case (_, nSh, nFp, _) => assert(nFp <= nSh - 4 + 1 && nFp > 0) }
  }

  test("charTokenRegression recovers an exact linear relation") {
    // y = 10x + 7 exactly, over x = token counts 1..4
    val docs = Seq(
      (1L, "en", "one", 17), (2L, "en", "one two", 27),
      (3L, "en", "one two three", 37), (4L, "en", "one two three four", 47)
    ).toDF("doc_id", "lang", "text", "n_chars")
    val r = TextOps.charTokenRegression(docs)
      .select("slope", "intercept").as[(Double, Double)].head()
    assert(r === ((10.0, 7.0)))
  }
}
