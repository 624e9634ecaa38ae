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
