package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Eval

/** Round-12d operators: classifier-evaluation suite (exact ROC AUC,
  * PR sweep, McNemar paired test, reliability/Brier bins). */
class Round12dSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String)*): DataFrame =
    rows.map { case (id, text, lang) => (id, text, lang, "s1", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // quality 1.0: >=20 chars, no punctuation, stopword-rich
  private val hi = "the cat and the dog sat in the house quietly"
  // quality ~0.05: short punctuation soup, no stopwords
  private val lo = "??? !!! ..."

  test("rocAuc: perfectly separated scores give AUC 1") {
    val d = docs((1L, hi, "en"), (2L, hi, "en"), (3L, lo, "fr"), (4L, lo, "de"))
    val r = Eval.rocAuc(d).collect()
    graft.CacheTracker.releaseAll()
    assert(r.length === 1)
    assert(r.head.getAs[Long]("n_pos") === 2L)
    assert(r.head.getAs[Long]("n_neg") === 2L)
    assert(r.head.getAs[Long]("n_scores") === 2L)
    assert(r.head.getAs[Double]("auc") === 1.0)
  }

  test("rocAuc: tied scores earn half credit (AUC 0.5)") {
    val d = docs((1L, hi, "en"), (2L, hi, "fr"))
    val r = Eval.rocAuc(d).collect().head
    graft.CacheTracker.releaseAll()
    assert(r.getAs[Double]("auc") === 0.5)
  }

  test("rocAuc: inverted ranking gives AUC 0") {
    val d = docs((1L, lo, "en"), (2L, hi, "fr"))
    val r = Eval.rocAuc(d).collect().head
    graft.CacheTracker.releaseAll()
    assert(r.getAs[Double]("auc") === 0.0)
  }

  test("prCurve: cumulative tp/fp sweep down the thresholds") {
    val d = docs((1L, hi, "en"), (2L, hi, "en"), (3L, lo, "fr"))
    val rows = Eval.prCurve(d).orderBy($"threshold".desc).collect()
    graft.CacheTracker.releaseAll()
    assert(rows.length === 2)
    val top = rows(0) // t = 1.0: both positives in, no negatives
    assert(top.getAs[Long]("tp") === 2L && top.getAs[Long]("fp") === 0L &&
      top.getAs[Long]("fn") === 0L)
    assert(top.getAs[Double]("precision") === 1.0 &&
      top.getAs[Double]("recall") === 1.0 && top.getAs[Double]("f1") === 1.0)
    val bot = rows(1) // t = low score: everything predicted positive
    assert(bot.getAs[Long]("tp") === 2L && bot.getAs[Long]("fp") === 1L)
    assert(math.abs(bot.getAs[Double]("precision") - 0.666667) < 1e-6)
    assert(bot.getAs[Double]("recall") === 1.0)
    assert(math.abs(bot.getAs[Double]("f1") - 0.8) < 1e-6)
  }

  test("mcnemarTest counts only the discordant cells") {
    val d = docs(
      (1L, "the cat and dog", "en"),      // A:2 stops T, B: markers T -> both right
      (2L, "cat dog is", "en"),           // A: 1 stop -> F (wrong), B: 'is' -> T (right): c
      (3L, "le chat query", "fr"),        // A: F (right), B: 'query' -> T (wrong): b
      (4L, "le chat et le chien", "fr"))  // both predict F -> both right
    val r = Eval.mcnemarTest(d).collect()
    assert(r.length === 1)
    val m = r.head
    assert(m.getAs[Long]("n") === 4L)
    assert(m.getAs[Long]("b_cell") === 1L)
    assert(m.getAs[Long]("c_cell") === 1L)
    assert(m.getAs[Double]("acc_a") === 0.75)
    assert(m.getAs[Double]("acc_b") === 0.75)
    // (|1-1| - 1)^2 / (1+1) = 0.5 with continuity correction
    assert(m.getAs[Double]("chi2") === 0.5)
  }

  test("mcnemarTest: zero discordance reports chi2 = 0, not a 0/0") {
    val d = docs((1L, "the cat and dog", "en"), (2L, "le chat et chien", "fr"))
    val m = Eval.mcnemarTest(d).collect().head
    assert(m.getAs[Long]("b_cell") === 0L && m.getAs[Long]("c_cell") === 0L)
    assert(m.getAs[Double]("chi2") === 0.0)
  }

  test("calibrationBins: micro-unit Brier matches the closed form") {
    val d = docs((1L, hi, "en"))
    // quality 1.0 -> p = sigma(2) = 0.880797 (6 dp), bin 8
    val rows = Eval.calibrationBins(d).collect()
    assert(rows.length === 1)
    val b = rows.head
    assert(b.getAs[Long]("bin") === 8L)
    assert(b.getAs[Long]("n") === 1L && b.getAs[Long]("n_pos") === 1L)
    assert(math.abs(b.getAs[Double]("mean_p") - 0.880797) < 1e-9)
    assert(b.getAs[Double]("frac_pos") === 1.0)
    val expectedBrier = math.pow(1.0 - 0.880797, 2)
    assert(math.abs(b.getAs[Double]("brier") - expectedBrier) < 1e-6)
  }

  test("calibrationBins: a perfectly calibrated bin has frac_pos near mean_p") {
    // two identical-score docs, one positive: frac_pos 0.5 in the bin
    val d = docs((1L, hi, "en"), (2L, hi, "fr"))
    val b = Eval.calibrationBins(d).collect().head
    assert(b.getAs[Long]("n") === 2L)
    assert(b.getAs[Double]("frac_pos") === 0.5)
  }
}
