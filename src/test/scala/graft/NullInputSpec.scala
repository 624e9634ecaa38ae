package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators._

/** Null-field totality: at 100 TB some rows WILL carry NULL text / lang /
  * source (failed extractions, schema drift). No operator may throw on
  * them — a null text row should either drop out of token-derived frames
  * (explode of a null array emits nothing) or flow through as a null
  * scalar, never kill the job. Sibling of EmptyInputSpec, which covers
  * zero-ROW inputs. */
class NullInputSpec extends SparkSpec {
  import spark.implicits._

  // two healthy docs around the degenerate ones so aggregates are non-empty
  private lazy val docs: DataFrame = Seq(
    (1L, Option("the quick brown fox jumps again and again"), Option("en"), Option("s1"), Option(42L)),
    (2L, None, Option("en"), Option("s1"), None),                   // null text
    (3L, Option("der schnelle braune fuchs springt wieder"), None, None, Option(40L)), // null lang+source
    (4L, Option(""), Option("fr"), Option("s2"), Option(0L))        // empty (not null) text
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  test("token-deriving text operators are total on null/empty text") {
    val ops: Seq[DataFrame => DataFrame] = Seq(
      TextOps.cleanDocs, TextOps.tokenCounts, d => TextOps.tokenizeIds(d),
      d => TfIdf.tfidf(d), d => Dedup.exact(d), TextOps.sentenceStats,
      TextOps.readability, d => LangModel.bm25(d),
      d => Graph.tokenTriangles(d),
      d => Dedup.spanDedup(d), d => Dedup.spanDedupTrim(d),
      d => Dedup.spanDedupIncremental(d, d.limit(0)),
      d => LangModel.ccnetBuckets(d), TextOps.tokenCoverageCurve,
      d => TextOps.corpusShuffle(d), TextOps.tokenFertility,
      d => Dedup.survivorship(d), d => LangModel.knBigram(d),
      d => Dedup.cdcChunks(d), d => graft.ml.Sentiment.lexiconScore(d),
      d => Dedup.simhashDetPairs(d), d => TextOps.qualityDrift(d),
      d => TextOps.packEfficiency(d), d => Dedup.minhashCalibration(d),
      d => TextOps.weightedSample(d), d => TextOps.shardBalance(d),
      d => TextOps.curriculumOrder(d), d => TextOps.docOovRate(d),
      d => LangModel.heldoutPerplexity(d), d => TextOps.mixtureEpoch(d),
      d => Dedup.thresholdSweep(d),
      d => TextOps.dpoPairs(d), d => TextOps.rewardNormalize(d),
      d => TfIdf.topicLabels(d), d => TextOps.sftPack(d),
      d => LangModel.stupidBackoff(d),
      d => TextOps.distinctNgrams(d), d => TextOps.raterAgreement(d),
      d => TextOps.rejectionSample(d), d => TextOps.blocklistFilter(d),
      d => Graph.tokenBfs(d),
      d => TextOps.renyiEfficiency(d), d => TextOps.qualityThresholdSweep(d),
      d => LangModel.doremiStep(d), d => LangModel.trigramTopk(d),
      d => LangModel.hillTailIndex(d),
      d => TextOps.stratifiedKfold(d), d => TextOps.mixtureTemperature(d),
      d => Graph.tokenDegreeStats(d), d => LangModel.bigramCondEntropy(d),
      d => Eval.rocAuc(d), d => Eval.prCurve(d),
      d => Eval.mcnemarTest(d), d => Eval.calibrationBins(d),
      d => TextOps.gloveCooc(d), d => TextOps.freqOfFreqs(d),
      d => LangModel.jmBigram(d), d => Eval.liftDeciles(d),
      d => LangModel.heapsLawFit(d), d => Eval.classReport(d),
      d => TextOps.tokenPositionBias(d), d => TextOps.sourceTokenHistSim(d),
      d => Graph.tokenKcore(d))
    for ((op, i) <- ops.zipWithIndex) {
      val out = op(docs)
      // must evaluate without throwing; row counts vary by op semantics
      assert(out.count() >= 0, s"text op #$i threw or produced negative count")
    }
  }

  test("round-13 text operators are total on null/empty text and null lang/source") {
    val ops: Seq[DataFrame => DataFrame] = Seq(
      d => LangModel.langIdChargram(d), d => TfIdf.rakeKeyphrases(d),
      d => LangModel.tokenDriftLogodds(d),
      d => TextOps.qualityResidualOutliers(d),
      d => Eval.brierDecomposition(d), d => TextOps.sourceChargramCosine(d),
      d => TextOps.dupRateSampleCheck(d),
      d => Eval.bleuPairs(d), d => Eval.chrfPairs(d))
    for ((op, i) <- ops.zipWithIndex) {
      val out = op(docs)
      assert(out.count() >= 0, s"round-13 op #$i threw on null fields")
      graft.CacheTracker.drainAll(spark)
    }
  }

  test("quality scoring flows null text through without throwing") {
    val q = TextOps.qualityScore(docs)
    assert(q.count() >= 2) // at minimum the healthy docs score
    assert(q.filter(col("doc_id") === 1L).count() === 1)
  }

  test("grouping operators tolerate null group keys (lang/source)") {
    // null lang/source must form their own group or be dropped — not throw
    for (df <- Seq(
        LangModel.sourceLangEntropy(docs),
        docs.groupBy("lang").agg(count(lit(1)).as("n")))) {
      assert(df.count() >= 1)
    }
  }

  test("dedup keeps the healthy docs when degenerate rows are present") {
    val kept = Dedup.exact(docs).select("keeper_id").as[Long].collect().toSet
    assert(kept.contains(1L) && kept.contains(3L),
      s"healthy docs must survive dedup alongside null/empty rows: $kept")
  }
}
