package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.ml.LogRegSql
import graft.operators.{LangModel, Relational, TextOps, TfIdf}

/** Round-8 batch 2: chi2 features, BM25 search, burstiness,
  * inter-arrival stats, RFM segmentation, declarative logistic GD. */
class Round8bSpec extends SparkSpec {
  import spark.implicits._

  test("chi2Features: perfectly associated token gets the max statistic") {
    // "aa" appears in every en doc and no fr doc; "cc" in 5 of 6 docs;
    // "dd" in ALL docs (df = N → excluded: chi2 undefined)
    val docs = Seq(
      (1L, "en", "aa cc dd"), (2L, "en", "aa cc dd"), (3L, "en", "aa cc dd"),
      (4L, "fr", "bb cc dd"), (5L, "fr", "bb cc dd"), (6L, "fr", "bb dd"))
      .toDF("doc_id", "lang", "text")
    val out = TfIdf.chi2Features(docs, minDf = 3)
      .as[(String, String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._5).toMap
    // perfect 2x2 association: chi2 = N = 6
    assert(out(("aa", "en")) === 6.0)
    // A = 0 cells never materialize (the frame is presence-sparse):
    // aa's anti-association with fr is implied by its en row
    assert(!out.contains(("aa", "fr")))
    // cc: a=3,b=2,c=0,d=1 → 6*(3-0)^2/(5*1*3*3) = 1.2
    assert(out(("cc", "en")) === 1.2)
    // df = N tokens carry no signal and would divide by zero: excluded
    assert(!out.keySet.exists(_._1 == "dd"))
  }

  test("bm25Search returns global top-k by summed query-term weight") {
    val docs = Seq(
      (1L, "query join scan extra words here"),
      (2L, "query query other tokens padding text"),
      (3L, "nothing relevant at all in this"),
      (4L, "join scan"))
      .toDF("doc_id", "text")
    val out = LangModel.bm25Search(docs, Seq("query", "join", "scan"), topK = 2)
      .as[(Long, Long, Double)].collect()
    assert(out.length === 2)
    // scores sorted descending; every returned doc matched >= 1 term
    assert(out.map(_._3).toSeq === out.map(_._3).sorted.reverse.toSeq)
    assert(out.forall(_._2 >= 1))
    assert(!out.map(_._1).contains(3L))
  }

  test("tokenBurstiness: even sprinkle scores 0, bursts score high") {
    val docs = (1L to 5L).map(i => (i, "even " + ("burst " * (if (i == 1) 9 else 1))))
      .toDF("doc_id", "text")
    val out = LangModel.tokenBurstiness(docs, minDf = 5)
      .as[(String, Long, Double, Double)].collect()
      .map(r => r._1 -> r._4).toMap
    assert(out("even") === 0.0) // tf identical in every doc → variance 0
    assert(out("burst") > 1.0) // 9-1-1-1-1 is overdispersed
  }

  test("interarrivalStats summarizes same-type gaps per user") {
    val events = Seq(
      (1L, 1L, "click", "2024-01-01 10:00:00"),
      (2L, 1L, "click", "2024-01-01 10:00:10"), // gap 10s
      (3L, 1L, "click", "2024-01-01 10:00:40"), // gap 30s
      (4L, 2L, "click", "2024-01-01 11:00:00"), // first per user: no gap
      (5L, 1L, "view", "2024-01-01 10:00:05")) // single view: no gap
      .map { case (e, u, t, ts) => (e, u, t, Timestamp.valueOf(ts)) }
      .toDF("event_id", "user_id", "event_type", "ts")
    val out = Relational.interarrivalStats(events)
      .as[(String, Long, Double, Double, Double, Long)].collect()
    assert(out.length === 1) // only click has gaps
    val (tpe, n, mean, p50, _, mx) = out.head
    assert((tpe, n, mx) === ("click", 2L, 30000000L))
    assert(mean === 20000000.0 && p50 === 20000000.0)
  }

  test("rfmSegments: quartiles are deterministic and 4 = best") {
    val orders = (1L to 8L).flatMap { c =>
      // customer c has c orders of $c each, latest on day c
      (1L to c).map(i => (c * 100 + i, c,
        Timestamp.valueOf(f"2024-01-${c}%02d 00:00:00"), c.toDouble))
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.rfmSegments(orders)
      .select("o_custkey", "r", "f", "m", "segment")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    // customer 8: most recent, most orders, highest spend → 444
    assert(out.last === ((8L, 4L, 4L, 4L, 444L)))
    // customer 1: oldest, fewest, lowest → 111
    assert(out.head === ((1L, 1L, 1L, 1L, 111L)))
    // 8 customers into quartiles of 2
    assert(out.map(_._2).count(_ == 4L) === 2)
  }

  test("embedPq encodes every (vector, subspace) with a valid code and " +
    "identical vectors share codes") {
    // 8 vecs, 16 dims → m=4 subspaces of 4 dims; vecs 0/4, 1/5, ... identical
    val emb = (0L until 8L).map { v =>
      (v, 0L, Array.tabulate(16)(d => ((v % 4) * 10 + d).toFloat))
    }.toDF("vec_id", "label", "embedding")
    val out = graft.operators.Similarity.embedPq(emb, m = 4, k = 4, dims = 16)
      .as[(Long, Long, Long, Double)].collect()
    assert(out.length === 8 * 4)
    assert(out.forall { case (_, sub, code, err) =>
      sub >= 0 && sub < 4 && code >= 0 && code < 4 && err >= 0.0 })
    // vec v and v+4 are identical → same code per subspace, zero error
    val codes = out.map(r => (r._1, r._2) -> r._3).toMap
    for (v <- 0L until 4L; s <- 0L until 4L)
      assert(codes((v, s)) === codes((v + 4, s)))
    // 4 distinct points per subspace, k=4 codewords, 2 Lloyd rounds from
    // the 4 distinct inits → every point sits ON its codeword
    assert(out.forall(_._4 === 0.0))
  }

  test("orderSkyline keeps exactly the non-dominated (date, price) orders") {
    val orders = Seq(
      (1L, "2024-01-01", 500.0), // dominated by 3 (newer, higher)
      (2L, "2024-01-02", 300.0), // dominated by 3
      (3L, "2024-01-03", 400.0), // skyline (newest among >= its price)
      (4L, "2024-01-01", 900.0), // skyline (highest overall)
      (5L, "2024-01-04", 100.0), // skyline (newest date)
      (6L, "2024-01-03", 400.0)) // duplicate of 3: kept too
      .map { case (k, d, p) => (k, Timestamp.valueOf(d + " 00:00:00"), p) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")
    val out = Relational.orderSkyline(orders)
      .select("o_orderkey").as[Long].collect().toSet
    assert(out === Set(3L, 4L, 5L, 6L))
  }

  test("spendGini: equal spend scores 0, total concentration approaches 1") {
    def gini(spends: Seq[Double]): Double = {
      val orders = spends.zipWithIndex
        .map { case (s, i) => (i.toLong + 1, i.toLong + 1,
          Timestamp.valueOf("2024-01-01 00:00:00"), s) }
        .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      Relational.spendGini(orders).select("gini").as[Double].head()
    }
    assert(gini(Seq.fill(10)(100.0)) === 0.0)
    assert(gini(Seq.fill(9)(0.01) ++ Seq(10000.0)) > 0.85)
  }

  test("weeklyRevenueWow computes Monday-week relative changes") {
    val orders = Seq(
      (1L, 1L, "2024-01-01", 100.0), // Mon week 1
      (2L, 2L, "2024-01-03", 100.0), // week 1
      (3L, 3L, "2024-01-08", 300.0), // week 2: +50%
      (4L, 4L, "2024-01-15", 150.0)) // week 3: -50%
      .map { case (k, c, d, p) => (k, c, Timestamp.valueOf(d + " 00:00:00"), p) }
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val out = Relational.weeklyRevenueWow(orders).orderBy("week")
      .select("week", "wow_change").as[(String, Double)].collect()
    assert(out.toSeq === Seq(("2024-01-08", 0.5), ("2024-01-15", -0.5)))
  }

  test("sourceLangEntropy: uniform mix scores ln(k), single lang scores 0") {
    val docs = Seq(
      (1L, "s1", "en"), (2L, "s1", "fr"), // uniform over 2 → ln 2
      (3L, "s2", "en"), (4L, "s2", "en")) // single lang → 0
      .toDF("doc_id", "source", "lang")
    val out = LangModel.sourceLangEntropy(docs)
      .select("source", "entropy").as[(String, Double)].collect().toMap
    // each -p·ln p term rounds to 6dp FIRST: 2 × 0.346574 = 0.693148
    assert(out("s1") === 0.693148)
    assert(out("s2") === 0.0)
  }

  test("forward as-of via negated time picks the FIRST right row at/after") {
    val left = Seq((1L, 1L, 100L), (2L, 1L, 250L))
      .toDF("l_id", "k", "ts").withColumn("neg_ts", -col("ts"))
    val right = Seq((7L, 1L, 100L), (8L, 1L, 200L), (9L, 1L, 300L))
      .toDF("r_id", "k", "r_ts").withColumn("neg_r_ts", -col("r_ts"))
    val out = graft.operators.AsOf
      .asofJoin(left, right, "k", "neg_ts", "neg_r_ts")
      .select("l_id", "r_id").as[(Long, Long)].collect().toMap
    // l1@100 → r7@100 (same instant visible); l2@250 → r9@300 (next after)
    assert(out === Map(1L -> 7L, 2L -> 9L))
  }

  test("zipfSlope recovers the exponent of an exact power law") {
    // token k repeated round(1000/k) times → ln f = ln 1000 − 1·ln rank.
    // Letter-only token names: the cleaner strips digits, so "tok01"
    // would collapse the whole vocabulary into one token.
    val text = (1 to 20).flatMap(k =>
      Seq.fill(math.round(1000.0 / k).toInt)("tok" + ('a' + k).toChar))
      .mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text")
    val Array((n, slope, _)) = LangModel.zipfSlope(docs)
      .as[(Long, Double, Double)].collect()
    assert(n === 20)
    assert(math.abs(slope - (-1.0)) < 0.01) // rounding of counts only
  }

  test("tokenWalks: every step lands on a true neighbor, walks reproduce") {
    val docs = Seq((1L, "aa bb cc bb dd"), (2L, "cc aa")).toDF("doc_id", "text")
    val out = graft.operators.Graph.tokenWalks(docs)
      .as[(String, String, String)].collect()
    // one 3-step walk per vocabulary token
    assert(out.length === 4)
    val adj = Map(
      "aa" -> Set("bb", "cc"), "bb" -> Set("aa", "cc", "dd"),
      "cc" -> Set("bb", "aa"), "dd" -> Set("bb"))
    for ((start, path, end) <- out) {
      val hops = path.split(">")
      assert(hops.head === start && hops.last === end && hops.length === 4)
      for (Array(u, v) <- hops.sliding(2))
        assert(adj(u).contains(v), s"$path takes a non-edge $u->$v")
    }
    // determinism: a second run yields byte-identical walks
    val again = graft.operators.Graph.tokenWalks(docs)
      .as[(String, String, String)].collect()
    assert(out.sortBy(_._1).toSeq === again.sortBy(_._1).toSeq)
  }

  test("skipgramPairs emits every within-window (center, context) pair") {
    val docs = Seq((1L, "aa bb cc")).toDF("doc_id", "text")
    val out = TextOps.skipgramPairs(docs, win = 2)
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // window ±2 over 3 tokens: every ordered pair once
    assert(out === Map(
      ("aa", "bb") -> 1L, ("aa", "cc") -> 1L, ("bb", "aa") -> 1L,
      ("bb", "cc") -> 1L, ("cc", "aa") -> 1L, ("cc", "bb") -> 1L))
  }

  test("negSamplingTable: exact cumulative shares reach 1, order is by weight") {
    val docs = Seq((1L, "aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa aa bb"))
      .toDF("doc_id", "text")
    val out = TextOps.negSamplingTable(docs)
      .orderBy(col("cum_share"))
      .as[(String, Long, Long, Double)].collect()
    // 16^0.75 = 8, 1^0.75 = 1 → shares 8/9 then 9/9
    assert(out.map(_._1).toSeq === Seq("aa", "bb"))
    assert(out.map(_._3).toSeq === Seq(8000000L, 1000000L))
    assert(out.last._4 === 1.0)
    assert(out.head._4 === 0.888889)
  }

  test("qualityLengthCorr: rank-identical signals score rho = 1") {
    // below the 20-char cap the quality score grows with length when the
    // text is pure stopwords → quality rank == length rank → rho = 1
    val docs = Seq(
      (1L, "en", "the"), (2L, "en", "the the"), (3L, "en", "the the the"))
      .map { case (id, l, t) => (id, l, t, t.length.toLong) }
      .toDF("doc_id", "lang", "text", "n_chars")
    val Array((lang, n, d2, rho)) = TextOps.qualityLengthCorr(docs)
      .as[(String, Long, Long, Double)].collect()
    assert((lang, n, d2, rho) === (("en", 3L, 0L, 1.0)))
  }

  test("eventTransitions: per-user ordered pairs, rows sum to 1 per source") {
    val events = Seq(
      (1L, 1L, "view", "2024-01-01 10:00:00", 1.0),
      (2L, 1L, "click", "2024-01-01 10:01:00", 1.0),
      (3L, 1L, "view", "2024-01-01 10:02:00", 1.0),
      (4L, 2L, "view", "2024-01-01 11:00:00", 1.0),
      (5L, 2L, "purchase", "2024-01-01 11:01:00", 1.0))
      .map { case (e, u, t, ts, v) => (e, u, t, Timestamp.valueOf(ts), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val out = Relational.eventTransitions(events)
      .as[(String, String, Long, Double)].collect()
    val m = out.map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // view → click, view → purchase (one each of 2 view departures)
    assert(m(("view", "click")) === ((1L, 0.5)))
    assert(m(("view", "purchase")) === ((1L, 0.5)))
    assert(m(("click", "view")) === ((1L, 1.0)))
    // no cross-user transition (user 1's last view never pairs with user 2)
    assert(!m.contains(("view", "view")))
  }

  test("langSourceChi2: independent mix scores 0, perfect dependence scores n") {
    // 2 langs × 2 sources, perfectly balanced → chi2 = 0, dof = 1
    val indep = Seq(
      (1L, "en", "s1", 5L), (2L, "en", "s2", 5L),
      (3L, "fr", "s1", 5L), (4L, "fr", "s2", 5L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val Array((chi0, dof0)) = TextOps.langSourceChi2(indep)
      .as[(Double, Long)].collect()
    assert((chi0, dof0) === ((0.0, 1L)))
    // lang fully determined by source → chi2 = n = 4
    val dep = Seq(
      (1L, "en", "s1", 5L), (2L, "en", "s1", 5L),
      (3L, "fr", "s2", 5L), (4L, "fr", "s2", 5L))
      .toDF("doc_id", "lang", "source", "n_chars")
    val Array((chi1, _)) = TextOps.langSourceChi2(dep)
      .as[(Double, Long)].collect()
    assert(chi1 === 4.0)
  }

  test("qualityByLengthDecile buckets all docs into 10 ordered deciles") {
    val docs = (1L to 40L).map(i => (i, "the " * i.toInt, 4 * i))
      .toDF("doc_id", "text", "n_chars")
    val out = TextOps.qualityByLengthDecile(docs)
      .orderBy("decile")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.length === 10)
    assert(out.map(_._2).sum === 40L) // every doc in exactly one decile
    // decile boundaries are non-overlapping and increasing
    for (Array(a, b) <- out.sliding(2)) assert(a._4 <= b._3)
  }

  test("docLangCoherence: a doc identical to its lang's only content " +
    "scores 1, off-topic docs score lower") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma"),
      (2L, "en", "alpha beta gamma"),
      (3L, "en", "delta epsilon zeta"), // off-topic within en
      (4L, "fr", "un deux trois"))
      .toDF("doc_id", "lang", "text")
    val out = graft.operators.Similarity.docLangCoherence(docs)
      .as[(Long, String, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L))
    assert(out(1L) === out(2L)) // identical docs, identical coherence
    assert(out(3L) < out(1L)) // off-topic doc sits farther from centroid
    assert(out(4L) === 1.0) // single-doc language: doc IS the centroid
    assert(out.values.forall(c => c >= -1.0 && c <= 1.0))
  }

  test("nearestCentroidLang classifies cleanly separated vocabularies perfectly") {
    val docs = Seq(
      (1L, "en", "alpha beta gamma"), (2L, "en", "alpha beta delta"),
      (3L, "fr", "un deux trois"), (4L, "fr", "un deux quatre"))
      .toDF("doc_id", "lang", "text")
    val out = graft.operators.Similarity.nearestCentroidLang(docs)
      .as[(Long, String, String, Double, Long)].collect()
    assert(out.length === 4)
    assert(out.forall(_._5 === 1L), s"disjoint vocabularies must classify perfectly: ${out.mkString}")
  }

  test("LogRegSql learns a separating direction on separable embeddings") {
    // dim 1 perfectly separates: label<5 ↔ x1 = +1
    val emb = (0L until 20L).map { v =>
      val y = v % 10 < 5
      (v, v % 10, Array(if (y) 1.0f else -1.0f, 0.5f))
    }.toDF("vec_id", "label", "embedding")
    val w = LogRegSql.weights(emb).as[(Long, Double)].collect().toMap
    assert(w(1L) > 0.1) // moved toward the separating direction
    assert(math.abs(w(2L)) < w(1L)) // uninformative dim stays smaller
    val preds = LogRegSql.predictions(emb)
      .select("y", "pred").as[(Double, Double)].collect()
    assert(preds.forall { case (y, p) => y === p }) // separable → all correct
  }
}
