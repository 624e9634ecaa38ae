package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-13 operators: char-trigram lang-ID, RAKE keyphrases, log-odds
  * token drift, regression-residual outliers, Brier decomposition, and
  * the C179-C183 engine-breadth rows (rolling median, islands,
  * percentiles, trade matrix, semi-additive balance). */
class Round13Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.map { case (id, lang, text) => (id, lang, text, text.length.toLong) }
      .toDF("doc_id", "lang", "text", "n_chars")

  private def events(rows: (Long, Long, String, String, Double)*): DataFrame =
    rows.map { case (e, u, t, ty, v) =>
      (e, u, java.sql.Timestamp.valueOf(t), ty, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")

  test("langIdChargram learns distinct char profiles and nails the held-out half") {
    // even ids train, odd ids test; the two langs share no trigram
    val d = docs(
      (0L, "aa", "aaaa aaab aaaa"), (2L, "aa", "aaab aaaa aaab"),
      (1L, "aa", "aaaa aaab"), (3L, "aa", "aaab aaaa"),
      (10L, "zz", "zzzz zzzy zzzz"), (12L, "zz", "zzzy zzzz zzzy"),
      (11L, "zz", "zzzz zzzy"), (13L, "zz", "zzzy zzzz"))
    val out = graft.operators.LangModel.langIdChargram(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("aa", "aa") -> 2L, ("zz", "zz") -> 2L))
  }

  test("langIdChargram predicts 'und' when no profile trigram matches") {
    val d = docs(
      (0L, "aa", "aaaa aaaa"), (2L, "aa", "aaaa"),
      (1L, "qq", "qqqq qqqq")) // test doc, but profiles only know 'aaa'
    val out = graft.operators.LangModel.langIdChargram(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(out === Map(("qq", "und") -> 1L))
  }

  test("rakeKeyphrases: repeated stopword-delimited phrase wins with deg/freq score") {
    // "deep learning" appears twice, split from single words by stopwords
    val d = docs((1L, "en", "deep learning of the deep learning"))
    val top = graft.operators.TfIdf.rakeKeyphrases(d).collect().head
    assert(top.getAs[String]("phrase") === "deep learning")
    assert(top.getAs[Long]("n_words") === 2L)
    assert(top.getAs[Long]("n_occurrences") === 2L)
    // deep: freq 2, deg 2+2 = 4 -> 2.0; learning same -> phrase score 4.0
    assert(top.getAs[Double]("score") === 4.0)
  }

  test("rakeKeyphrases drops phrases longer than maxPhraseLen") {
    val d = docs((1L, "en", "alpha beta gamma delta epsilon"))
    assert(graft.operators.TfIdf.rakeKeyphrases(d, maxPhraseLen = 4).count() === 0L)
    assert(graft.operators.TfIdf.rakeKeyphrases(d, maxPhraseLen = 5).count() === 1L)
  }

  test("tokenDriftLogodds surfaces the half-exclusive tokens with opposite signs") {
    val d = docs(
      (0L, "en", "foo foo foo common common"),
      (2L, "en", "foo common"),
      (1L, "en", "bar bar bar common common"),
      (3L, "en", "bar common"))
    val rows = graft.operators.LangModel.tokenDriftLogodds(d, k = 1).collect()
    val up = rows.find(_.getAs[String]("direction") == "h1").get
    val dn = rows.find(_.getAs[String]("direction") == "h2").get
    assert(up.getAs[String]("token") === "foo" && up.getAs[Double]("z") > 0)
    assert(dn.getAs[String]("token") === "bar" && dn.getAs[Double]("z") < 0)
  }

  test("qualityResidualOutliers ranks the off-the-line doc first") {
    // lang 'en': chars ~ tokens fit; one doc padded far off the line.
    // n_chars is the SCHEMA column (set from text length in docs())
    // low-leverage outlier: token count inside the base range, but char
    // count blown up by non-letter padding (cleaned away by tokenize)
    val base = (1L to 6L).map(i =>
      (i, "en", Seq.fill(i.toInt)("word").mkString(" ")))
    val outlier = (7L, "en", "worda wordb wordc " + "!" * 400)
    val d = docs(base :+ outlier: _*)
    val top = graft.operators.TextOps.qualityResidualOutliers(d, k = 3).collect()
    assert(top.head.getAs[Long]("doc_id") === 7L)
    assert(math.abs(top.head.getAs[Double]("resid")) >
      math.abs(top(1).getAs[Double]("resid")))
  }

  test("brierDecomposition: uncertainty is the base-rate floor and the identity holds") {
    val d = docs(
      (1L, "en", "the cat is in the hat and it is flat today again"),
      (2L, "en", "a dog and a log in a bog of fog stay"),
      (3L, "fr", "xyzzy plugh !!!"),
      (4L, "fr", "qwerty azerty ??!"),
      (5L, "en", "it is a good day to test the code of this repo"),
      (6L, "fr", "zzz @@@ ###"))
    val r = graft.operators.Eval.brierDecomposition(d).collect().head
    val base = r.getAs[Double]("base_rate")
    assert(r.getAs[Long]("n") === 6L)
    assert(base === 0.5)
    assert(r.getAs[Double]("uncertainty") === 0.25)
    assert(r.getAs[Double]("reliability") >= 0.0)
    assert(r.getAs[Double]("resolution") >= 0.0)
    // Murphy identity up to within-bin variance of p-hat
    val approx = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty")
    assert(math.abs(approx - r.getAs[Double]("brier")) < 0.05)
  }

  private def orders(rows: (Long, String, Double)*): DataFrame =
    rows.map { case (k, d, p) => (k, java.sql.Date.valueOf(d), p) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")

  test("revenueRollingMedian: each window sees only its trailing 7 existing days") {
    val o = orders(
      (1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0),
      (3L, "2024-01-03", 3.0), (4L, "2024-01-10", 10.0))
    val out = graft.operators.Relational.revenueRollingMedian(o).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val d0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    assert(out(d0) === ((1L, 100.0)))
    assert(out(d0 + 1) === ((2L, 150.0)))       // median(100, 200)
    assert(out(d0 + 2) === ((3L, 200.0)))       // median(100, 200, 300)
    assert(out(d0 + 9) === ((1L, 1000.0)))      // day 10: window has only itself
  }

  test("activeDayIslands splits streaks at the gap") {
    val e = events(
      (1L, 1L, "2024-01-01 10:00:00", "view", 0.0),
      (2L, 1L, "2024-01-02 10:00:00", "view", 0.0),
      (3L, 1L, "2024-01-02 22:00:00", "click", 0.0), // same day, no new island
      (4L, 1L, "2024-01-03 10:00:00", "view", 0.0),
      (5L, 1L, "2024-01-07 10:00:00", "view", 0.0),
      (6L, 1L, "2024-01-08 10:00:00", "view", 0.0))
    val out = graft.operators.Relational.activeDayIslands(e).collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sorted
    val d0 = java.time.LocalDate.parse("2024-01-01").toEpochDay
    assert(out === Seq((d0, d0 + 2, 3L), (d0 + 6, d0 + 7, 2L)).sorted)
  }

  test("orderPricePercentiles: exact percent_rank / cume_dist without a global window") {
    val o = orders(
      (1L, "2024-01-01", 1.0), (2L, "2024-01-01", 2.0),
      (3L, "2024-01-01", 3.0), (4L, "2024-01-01", 4.0))
    val out = graft.operators.Relational.orderPricePercentiles(o).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3))).toMap
    assert(out(1L) === ((0.0, 0.25)))
    assert(out(2L) === ((0.333333, 0.5)))
    assert(out(4L) === ((1.0, 1.0)))
  }

  test("nationTradeMatrix routes revenue to the right nation pair") {
    val li = Seq((100L, 7L, 10.0, 0.1)).toDF("l_orderkey", "l_suppkey",
      "l_extendedprice", "l_discount")
    val o = Seq((100L, 1L)).toDF("o_orderkey", "o_custkey")
    val c = Seq((1L, 3L)).toDF("c_custkey", "c_nationkey")
    val s = Seq((7L, 4L)).toDF("s_suppkey", "s_nationkey")
    val n = Seq((3L, "FRANCE"), (4L, "GERMANY")).toDF("n_nationkey", "n_name")
    val out = graft.operators.Relational.nationTradeMatrix(li, o, c, s, n).collect()
    assert(out.length === 1)
    assert(out.head.getAs[String]("cust_nation") === "FRANCE")
    assert(out.head.getAs[String]("supp_nation") === "GERMANY")
    assert(out.head.getAs[Long]("revenue_cents") === 900L)
  }

  test("topOrdersPerCustomer keeps exactly the 3 priciest orders per customer") {
    val o = (1L to 5L).map(i => (i, "2024-01-01", i.toDouble))
      .map { case (k, d, p) => (k, java.sql.Date.valueOf(d), p, 42L) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice", "o_custkey")
    val out = graft.operators.Relational.topOrdersPerCustomer(o).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.sorted === Seq((1L, 5L), (2L, 4L), (3L, 3L)))
  }

  test("mktsegmentMonthlyShare: shares sum to 1 per month and MoM delta tracks the shift") {
    val o = Seq((1L, "2024-01-05", 1.0, 1L), (2L, "2024-01-15", 3.0, 2L),
        (3L, "2024-02-05", 3.0, 1L), (4L, "2024-02-15", 1.0, 2L))
      .map { case (k, d, p, c) => (k, java.sql.Date.valueOf(d), p, c) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice", "o_custkey")
    val c = Seq((1L, "BUILDING"), (2L, "MACHINERY")).toDF("c_custkey", "c_mktsegment")
    val out = graft.operators.Relational.mktsegmentMonthlyShare(o, c).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getAs[Double]("share"), Option(r.getAs[Any]("share_mom_delta")))).toMap
    val m0 = 2024 * 12 + 0
    assert(out((m0, "BUILDING"))._1 === 0.25)
    assert(out((m0, "BUILDING"))._2 === None) // first month: no delta
    assert(out((m0 + 1, "BUILDING"))._1 === 0.75)
    assert(out((m0 + 1, "BUILDING"))._2.get === 0.5)
  }

  test("nationAcctbalProfile counts arrears and exact percentiles per nation") {
    val c = Seq((1L, 3L, -5.0), (2L, 3L, 10.0), (3L, 3L, 20.0))
      .toDF("c_custkey", "c_nationkey", "c_acctbal")
    val n = Seq((3L, "FRANCE")).toDF("n_nationkey", "n_name")
    val r = graft.operators.Relational.nationAcctbalProfile(c, n).collect().head
    assert(r.getAs[Long]("n_customers") === 3L)
    assert(r.getAs[Long]("n_negative") === 1L)
    assert(r.getAs[Double]("p50_cents") === 1000.0)
    assert(math.abs(r.getAs[Double]("negative_share") - 0.333333) < 1e-6)
  }

  test("quantityDiscountGrid: exact cents per (quantity, bp) cell") {
    val li = Seq((1L, 2.0, 10.0, 0.1), (2L, 2.0, 20.0, 0.1), (3L, 5.0, 10.0, 0.0))
      .toDF("l_orderkey", "l_quantity", "l_extendedprice", "l_discount")
    val out = graft.operators.Relational.quantityDiscountGrid(li).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getAs[Long]("n_lines"), r.getAs[Long]("revenue_cents"))).toMap
    assert(out((2L, 10L)) === ((2L, 900L + 1800L)))
    assert(out((5L, 0L)) === ((1L, 1000L)))
  }

  test("embedPcaProject: dominant axis carries the spread, minor axis stays small") {
    // rank-2 data: big variance along (1,1,0,..), small along dim 3 —
    // rank-1 data would deflate to a zero matrix and a NaN v2
    val ts = Seq(-2f, -1f, 0f, 1f, 2f)
    val ss = Seq(0.1f, -0.1f, 0.1f, -0.1f, 0.1f)
    val vecs = ts.zip(ss).zipWithIndex.map { case ((t, s), i) =>
      (i.toLong, Array(t, t, s, 0f, 0f, 0f, 0f, 0f), 0)
    }.toDF("vec_id", "embedding", "label")
    val out = graft.operators.Similarity.embedPcaProject(vecs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Double]("p1"), r.getAs[Double]("p2"))).toMap
    // p1 spreads monotonically with t (up to a global sign)
    val p1s = (0L to 4L).map(out(_)._1)
    assert(p1s.distinct.size === 5)
    assert(p1s == p1s.sorted || p1s == p1s.sorted.reverse)
    // the minor axis's spread is an order of magnitude smaller
    val spread1 = p1s.max - p1s.min
    val p2s = (0L to 4L).map(out(_)._2)
    assert(p2s.max - p2s.min < spread1 / 5)
  }

  test("sourceChargramCosine: identical feeds read 1.0, disjoint feeds 0.0") {
    val d = docs(
      (1L, "en", "abcdef"), (2L, "en", "abcdef"),
      (3L, "en", "uvwxyz"))
      .withColumn("source",
        when(col("doc_id") === 1L, "sA").when(col("doc_id") === 2L, "sB")
          .otherwise("sC"))
    val out = graft.operators.TextOps.sourceChargramCosine(d).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(out(("sA", "sB")) === 1.0)
    assert(!out.contains(("sA", "sC")) || out(("sA", "sC")) === 0.0)
  }

  test("dupRateSampleCheck: planted duplicates give the exact rate; sample tracks it") {
    // ids 0,10 sampled (doc_id%10=0); texts: 0 and 1 duplicate content
    val d = docs(
      (0L, "en", "same text here"), (1L, "en", "same text here"),
      (10L, "en", "other text"), (11L, "en", "third text"))
    val r = graft.operators.TextOps.dupRateSampleCheck(d).collect().head
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Double]("dup_rate_exact") === 0.25)
    assert(r.getAs[Long]("n_sample") === 2L)
    assert(r.getAs[Double]("dup_rate_sample") === 0.0) // sample missed the dup
    assert(r.getAs[Double]("abs_err") === 0.25)
  }

  test("ordersRunningShare accumulates to exactly 1.0 on the last day") {
    val o = orders(
      (1L, "2024-01-01", 1.0), (2L, "2024-01-02", 2.0), (3L, "2024-01-03", 1.0))
    val out = graft.operators.Relational.ordersRunningShare(o).collect()
      .sortBy(_.getLong(0))
    assert(out.map(_.getAs[Double]("cum_share")).toSeq === Seq(0.25, 0.75, 1.0))
    assert(out.last.getAs[Long]("cum_r") === 400L)
  }

  test("bleuPairs: clipped precisions and brevity penalty match the hand calc") {
    val d = Seq(
      (1L, "en", "the quick brown fox jumps", "srcX", 25L),
      (2L, "en", "the quick brown fox sleeps now", "srcX", 30L))
      .toDF("doc_id", "lang", "text", "source", "n_chars")
    val r = graft.operators.Eval.bleuPairs(d).collect()
    assert(r.length === 1)
    val row = r.head
    assert(row.getAs[Long]("a_id") === 1L && row.getAs[Long]("b_id") === 2L)
    assert(row.getAs[Double]("p1") === 0.8)   // the/quick/brown/fox clip = 4 of 5
    assert(row.getAs[Double]("p2") === 0.75)  // 3 shared bigrams of 4
    val bp = math.exp(1.0 - 6.0 / 5.0)        // len_a 5 < len_b 6
    assert(math.abs(row.getAs[Double]("bleu2") - bp * math.sqrt(0.6)) < 1e-5)
  }

  test("chrfPairs: identical texts read chrF2 = 1, and P/R split on containment") {
    val d = Seq(
      (1L, "en", "alpha beta gamma delta", "srcX", 22L),
      (2L, "en", "alpha beta gamma delta", "srcX", 22L))
      .toDF("doc_id", "lang", "text", "source", "n_chars")
    val r = graft.operators.Eval.chrfPairs(d).collect().head
    assert(r.getAs[Double]("p") === 1.0 && r.getAs[Double]("r") === 1.0)
    assert(r.getAs[Double]("chrf2") === 1.0)
  }

  test("supplierHhiByType: a monopolised type reads HHI 1, an even split 1/n") {
    val li = Seq(
      (1L, 10L, 100L, 10.0, 0.0), (2L, 10L, 100L, 10.0, 0.0),   // type A: one supplier
      (3L, 20L, 200L, 10.0, 0.0), (4L, 20L, 300L, 10.0, 0.0))   // type B: 50/50
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
    val p = Seq((10L, "A"), (20L, "B")).toDF("p_partkey", "p_type")
    val out = graft.operators.Relational.supplierHhiByType(li, p).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("hhi"),
        r.getAs[Double]("effective_suppliers"))).toMap
    assert(out("A") === ((1.0, 1.0)))
    assert(out("B") === ((0.5, 2.0)))
  }

  test("orderAgingBuckets cuts at 30/60/90 against the latest order date") {
    val o = Seq(
      (1L, "O", "2024-04-10", 1.0),  // age 0 -> 00-29
      (2L, "O", "2024-03-15", 2.0),  // age 26 -> 00-29
      (3L, "F", "2024-02-15", 3.0),  // age 55 -> 30-59
      (4L, "F", "2023-12-01", 4.0))  // age 131 -> 90+
      .map { case (k, st, d, pr) => (k, st, java.sql.Date.valueOf(d), pr) }
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice")
    val out = graft.operators.Relational.orderAgingBuckets(o).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_orders")).toMap
    assert(out === Map(("O", "00-29") -> 2L, ("F", "30-59") -> 1L, ("F", "90+") -> 1L))
  }

  test("dedupTransitivity: a triangle closes its wedges, a path does not") {
    // 4 vectors in one bucket: 0,1,2 mutually close (triangle);
    // 3 close only to 2 (pendant) -> wedges through 2 stay open
    def v(x: Float, y: Float) =
      Array(1f, x, y, 0.1f, 0.1f, 0.1f, 0.1f, 0.1f)
    val emb = Seq(
      (0L, v(0.50f, 0.50f), 0), (1L, v(0.51f, 0.50f), 0),
      (2L, v(0.50f, 0.51f), 0), (3L, v(0.52f, 0.52f), 0))
      .toDF("vec_id", "embedding", "label")
    val r = graft.operators.Similarity.dedupTransitivity(emb, cosMin = 0.99).collect().head
    // all 4 vectors are nearly parallel -> complete graph: 6 pairs, all wedges closed
    assert(r.getAs[Long]("n_pairs") === 6L)
    assert(r.getAs[Double]("closure_rate") === 1.0)
  }

  test("round-13 operators are total on empty inputs") {
    val noDocs = Seq.empty[(Long, String, String, String, Long)]
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val noEvents = Seq.empty[(Long, Long, String, java.sql.Timestamp, Double)]
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val noOrders = Seq.empty[(Long, Long, java.sql.Timestamp, Double)]
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    val noOrdersSt = Seq.empty[(Long, String, java.sql.Timestamp, Double)]
      .toDF("o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice")
    val noEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    val noCust = Seq.empty[(Long, Long, Double, String)]
      .toDF("c_custkey", "c_nationkey", "c_acctbal", "c_mktsegment")
    val noNation = Seq.empty[(Long, String)].toDF("n_nationkey", "n_name")
    val noLi = Seq.empty[(Long, Long, Long, Double, Double, Double)]
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount")
    val noPart = Seq.empty[(Long, String)].toDF("p_partkey", "p_type")

    assert(graft.operators.LangModel.langIdChargram(noDocs).count() === 0)
    graft.CacheTracker.drainAll(spark)
    assert(graft.operators.TfIdf.rakeKeyphrases(noDocs).count() === 0)
    assert(graft.operators.LangModel.tokenDriftLogodds(noDocs).count() === 0)
    assert(graft.operators.TextOps.qualityResidualOutliers(noDocs).count() === 0)
    assert(graft.operators.Eval.brierDecomposition(noDocs).count() === 0)
    assert(graft.operators.Relational.revenueRollingMedian(noOrders).count() === 0)
    assert(graft.operators.Relational.activeDayIslands(noEvents).count() === 0)
    assert(graft.operators.Relational.orderPricePercentiles(noOrders).count() === 0)
    graft.CacheTracker.drainAll(spark)
    assert(graft.operators.Relational.nationTradeMatrix(
      noLi, noOrders, noCust, Seq.empty[(Long, Long)].toDF("s_suppkey", "s_nationkey"),
      noNation).count() === 0)
    assert(graft.operators.Relational.weeklyLastBalance(noEvents).count() === 0)
    assert(graft.operators.Relational.mktsegmentMonthlyShare(noOrders, noCust)
      .count() === 0)
    assert(graft.operators.Relational.nationAcctbalProfile(noCust, noNation)
      .count() === 0)
    assert(graft.operators.Relational.quantityDiscountGrid(noLi).count() === 0)
    assert(graft.operators.Similarity.embedPcaProject(noEmb).count() === 0)
    graft.CacheTracker.drainAll(spark)
    assert(graft.operators.TextOps.sourceChargramCosine(noDocs).count() === 0)
    // one-row global summaries emit their zero-count row, never throw
    assert(graft.operators.TextOps.dupRateSampleCheck(noDocs).count() === 1)
    assert(graft.operators.Relational.ordersRunningShare(noOrders).count() === 0)
    graft.CacheTracker.drainAll(spark)
    assert(graft.operators.Eval.bleuPairs(noDocs).count() === 0)
    assert(graft.operators.Eval.chrfPairs(noDocs).count() === 0)
    graft.CacheTracker.drainAll(spark)
    val dt = graft.operators.Similarity.dedupTransitivity(noEmb).collect()
    assert(dt.length === 1 && dt.head.getAs[Double]("closure_rate") === 0.0)
    graft.CacheTracker.drainAll(spark)
    assert(graft.operators.Relational.supplierHhiByType(noLi, noPart).count() === 0)
    assert(graft.operators.Relational.orderAgingBuckets(noOrdersSt).count() === 0)
  }

  test("tokenAttrition weighs gates by token mass; the 5 rows cover pass + gates") {
    // healthy doc: 120 DISTINCT letter-only tokens (digits would clean
    // away and collapse into repetition), long enough, punct-free
    val healthy = (0 until 120)
      .map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}x").mkString(" ")
    val d = docs(
      (1L, "en", healthy),
      (2L, "en", "tiny")) // short + quality
    val out = graft.operators.TextOps.tokenAttrition(d).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("tokens")).toMap
    assert(out.keySet === Set("short", "quality", "repetition", "duplicate", "pass"))
    assert(out("short") === 1L)   // the tiny doc's single token
    assert(out("pass") === 120L)  // the healthy doc's 120 tokens
  }

  test("eventsRangeWindow counts by TIME range, not row count") {
    val e = events(
      (1L, 1L, "2024-01-01 10:00:00", "view", 1.0),
      (2L, 1L, "2024-01-01 10:30:00", "view", 2.0),
      (3L, 1L, "2024-01-01 11:15:00", "view", 4.0)) // event 1 fell out of range
    val out = graft.operators.Relational.eventsRangeWindow(e).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_trailing_1h"),
        r.getAs[Long]("cents_trailing_1h"))).toMap
    assert(out(1L) === ((1L, 100L)))
    assert(out(2L) === ((2L, 300L)))
    assert(out(3L) === ((2L, 600L))) // 10:30 still inside [10:15, 11:15]
  }

  test("detectorAgreement: exact duplicates land in both pair sets, jaccard 1") {
    val text = (0 until 30)
      .map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}q").mkString(" ")
    val d = docs((1L, "en", text), (2L, "en", text))
    val r = graft.operators.Dedup.detectorAgreement(d).collect().head
    assert(r.getAs[Long]("n_minhash") === 1L)
    assert(r.getAs[Long]("n_simhash") === 1L)
    assert(r.getAs[Long]("n_both") === 1L)
    assert(r.getAs[Double]("pair_jaccard") === 1.0)
  }

  test("charEntropy: uniform alphabet reads ln(k), single char reads 0") {
    val d = docs((1L, "en", "abcd"), (2L, "en", "aaaa"))
    val out = graft.operators.TextOps.charEntropy(d).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("entropy_nats")).toMap
    assert(math.abs(out(1L) - math.log(4.0)) < 1e-5)
    assert(out(2L) === 0.0)
  }

  test("truncationLoss: exact token mass over each grid length") {
    val words200 = (0 until 200)
      .map(i => s"${('a' + i / 26).toChar}${('a' + i % 26).toChar}t").mkString(" ")
    val d = docs((1L, "en", words200), (2L, "en", "tiny doc here"))
    val out = graft.operators.TextOps.truncationLoss(d).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_docs_truncated"),
        r.getAs[Long]("tokens_lost"))).toMap
    assert(out(128L) === ((1L, 72L)))   // 200-token doc loses 72
    assert(out(512L) === ((0L, 0L)))
    assert(out(2048L) === ((0L, 0L)))
  }

  test("hashUniformityCheck: near-uniform corpus is not flagged skewed") {
    val d = docs((1L to 200L).map(i =>
      (i, "en", s"document number ${('a' + (i % 26)).toChar} with body $i " * 2)): _*)
    val r = graft.operators.TextOps.hashUniformityCheck(d).collect().head
    assert(r.getAs[Long]("n_docs") === 200L)
    assert(r.getAs[Long]("df") === 63L)
    assert(r.getAs[Double]("chi2") >= 0.0)
  }

  test("parquet_schema_merge: early-generation rows null-fill the late columns") {
    val df = SparkEntry.queries("parquet_schema_merge")(spark, "")
    val rows = df.collect().map(r => r.getLong(0) ->
      (Option(r.getAs[String]("lang")), Option(r.getAs[Any]("stars")))).toMap
    assert(rows.size === 5)
    assert(rows(1L) === ((None, None)))     // v1 file: evolved columns null
    assert(rows(4L) === ((Some("en"), Some(3L))))
  }

  test("weeklyLastBalance keeps the LAST value per user-week, then sums") {
    val e = events(
      (1L, 1L, "2024-01-01 10:00:00", "view", 5.0),
      (2L, 1L, "2024-01-03 10:00:00", "view", 7.0),   // later in same week: wins
      (3L, 2L, "2024-01-02 10:00:00", "view", 1.0))
    val out = graft.operators.Relational.weeklyLastBalance(e).collect()
    assert(out.length === 1)
    assert(out.head.getAs[Long]("n_users") === 2L)
    assert(out.head.getAs[Long]("eow_balance_cents") === 800L)
  }
}
