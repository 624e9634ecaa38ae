package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Multinomial Naive Bayes as pure DataFrame algebra — the Spark-first
  * restatement of the reference's hand-rolled Hadoop classifier
  * (reference Hadoop/NB.java:385-520: per-class word counts with Laplace
  * smoothing, class priors, probability product per document, argmax).
  *
  * Unlike the ml.NaiveBayes pipeline (Sentiment.scala), every step here is
  * SQL-expressible, so the driver's DuckDB oracle checks the classifier's
  * *predictions document by document* — classifier-level correctness, not
  * just plumbing.
  *
  * Score in log space (NB.java:481-501 multiplies raw probabilities, which
  * underflows at scale; the log form is the standard fix):
  *   score(d, l) = ln(prior_l)
  *               + Σ_t tf(d,t) · ln(cnt(l,t) + 1)
  *               - n_d · ln(classTotal_l + V)
  * Train/test split is the deterministic doc_id % 4 (Sentiment.splitCol).
  * Deterministic argmax: rounded score desc, then label.
  *
  * Scale: token-count aggregation is one partial-aggregated shuffle; the
  * per-class model (counts, totals, priors, V) is tiny and broadcast; the
  * scoring join fans each test token row out over |classes| rows only.
  */
object NaiveBayesSql {

  /** (doc_id, label, predicted) for the test split of (doc_id, text, label). */
  def predictions(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), col("label"),
      explode(TextOps.tokens(col("text"))).as("token"))
    val isTrain = Sentiment.splitCol("doc_id") === "train"

    val trainToks = toks.filter(isTrain)
    val cnt = trainToks.groupBy("label", "token").agg(count(lit(1)).as("cnt"))
    val classTot = cnt.groupBy("label").agg(sum("cnt").as("ct"))
    val vocab = cnt.agg(countDistinct(col("token")).as("v"))
    val priors = docs.filter(isTrain).groupBy("label").agg(count(lit(1)).as("n_docs"))
      .crossJoin(broadcast(docs.filter(isTrain).agg(count(lit(1)).as("n_train"))))

    val testTf = toks.filter(!isTrain)
      .groupBy("doc_id", "token").agg(count(lit(1)).as("tf"))
    val docLen = toks.filter(!isTrain).groupBy("doc_id").agg(count(lit(1)).as("n_d"))

    val labels = priors.select(col("label").as("cand"))
    val scored = testTf
      .crossJoin(broadcast(labels))
      .join(broadcast(cnt.withColumnRenamed("label", "cand")), Seq("cand", "token"), "left")
      .withColumn("part",
        col("tf") * log((coalesce(col("cnt"), lit(0L)) + 1).cast("double")))
      .groupBy("doc_id", "cand")
      .agg(sum(col("part")).as("s"))
      .join(docLen, "doc_id")
      .join(broadcast(classTot.withColumnRenamed("label", "cand")), "cand")
      .crossJoin(broadcast(vocab))
      .join(broadcast(priors.withColumnRenamed("label", "cand")), "cand")
      .withColumn("score", round(
        col("s") - col("n_d") * log((col("ct") + col("v")).cast("double"))
          + log(col("n_docs").cast("double") / col("n_train")), 6))

    val w = Window.partitionBy("doc_id").orderBy(col("score").desc, col("cand"))
    val pred = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("doc_id"), col("cand").as("predicted"))

    docs.filter(!isTrain).select(col("doc_id"), col("label")).join(pred, "doc_id")
  }

  /** Group-aware k-fold cross-validated NB accuracy (B256): k models
    * trained and evaluated in ONE pass over the corpus via COMPLEMENT
    * counts — per-fold token counts aggregate once, and fold f's model
    * is (total − fold_f) for every statistic (word counts, class
    * totals, priors, vocabulary), so "train k models" costs one extra
    * group key instead of k corpus scans. Folds assign by SOURCE
    * (md5 mod k, the [[graft.operators.TextOps.groupKfold]] rule), so
    * within-source templates can't inflate the estimate by straddling
    * a boundary — the honest generalization readout where the fixed
    * doc_id%4 split of [[predictions]] gives one point estimate.
    * Scoring, argmax and rounding mirror [[predictions]] exactly. */
  def cvAccuracy(docs: DataFrame, k: Int = 5): DataFrame = {
    val foldOf = conv(substring(md5(col("source")), 1, 8), 16, 10)
      .cast("long") % k
    val base = docs.select(col("doc_id"), col("text"),
      col("lang").as("label"), foldOf.as("fold"))
    // ONE corpus tokenize+explode (r18): the per-doc tf frame feeds
    // BOTH the per-fold count model (summing tf over docs ≡ counting
    // token occurrences) and the scoring side, and doc lengths are
    // Σ tf — the old shape re-exploded the corpus three times (cntF /
    // testTf / docLen each re-ran the regex tokenizer end to end).
    // The pinned frame is the per-(doc, token) tf table — the same
    // persisted-featurize-frame discipline as the NB/SVM pipelines.
    val testTf = graft.CacheTracker.track(
      base.select(col("doc_id"), col("label"), col("fold"),
          explode(TextOps.tokens(col("text"))).as("token"))
        .groupBy("fold", "label", "doc_id", "token")
        .agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val cntF = testTf.groupBy("fold", "label", "token")
      .agg(sum(col("tf")).as("c"))
    val cntAll = cntF.groupBy("label", "token").agg(sum(col("c")).as("ca"))
    val folds = base.select("fold").distinct()
    // fold × vocab × label-bounded and consumed three times (classTot,
    // vocab, the scoring join): pin it
    val comp = graft.CacheTracker.track(folds.crossJoin(cntAll)
      .join(cntF, Seq("fold", "label", "token"), "left")
      .select(col("fold"), col("label"), col("token"),
        (col("ca") - coalesce(col("c"), lit(0L))).as("cnt"))
      .filter(col("cnt") > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val classTot = comp.groupBy("fold", "label").agg(sum(col("cnt")).as("ct"))
    val vocab = comp.select("fold", "token").distinct()
      .groupBy("fold").agg(count(lit(1)).as("v"))
    val nDocsF = base.groupBy("fold", "label").agg(count(lit(1)).as("nd"))
    val priors = folds.crossJoin(nDocsF.groupBy("label").agg(sum(col("nd")).as("nda")))
      .join(nDocsF, Seq("fold", "label"), "left")
      .select(col("fold"), col("label"),
        (col("nda") - coalesce(col("nd"), lit(0L))).as("n_docs"))
      .filter(col("n_docs") > 0)
    val nTrain = priors.groupBy("fold").agg(sum(col("n_docs")).as("n_train"))
    val docLen = testTf.groupBy("fold", "doc_id").agg(sum(col("tf")).as("n_d"))
    val labels = priors.select(col("fold"), col("label").as("cand"))
    // every model-side frame here is fold × label-bounded (k·|langs| ≤
    // ~30 rows at ANY corpus scale) — broadcast them explicitly so the
    // scoring chain shuffles only on its data-sized keys; comp is
    // fold × vocab × label-bounded and stays a shuffle join by design
    val scored = testTf.drop("label")
      .join(broadcast(labels), Seq("fold"))
      .join(comp.select(col("fold"), col("label").as("cand"), col("token"),
        col("cnt")), Seq("fold", "cand", "token"), "left")
      .withColumn("part",
        col("tf") * log((coalesce(col("cnt"), lit(0L)) + 1).cast("double")))
      .groupBy("fold", "doc_id", "cand").agg(sum(col("part")).as("s"))
      .join(docLen, Seq("fold", "doc_id"))
      .join(broadcast(classTot.withColumnRenamed("label", "cand")),
        Seq("fold", "cand"))
      .join(broadcast(vocab), Seq("fold"))
      .join(broadcast(priors.withColumnRenamed("label", "cand")),
        Seq("fold", "cand"))
      .join(broadcast(nTrain), Seq("fold"))
      .withColumn("score", round(
        col("s") - col("n_d") * log((col("ct") + col("v")).cast("double"))
          + log(col("n_docs").cast("double") / col("n_train")), 6))
    val w = Window.partitionBy("fold", "doc_id")
      .orderBy(col("score").desc, col("cand"))
    val pred = scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1)
      .select(col("fold"), col("doc_id"), col("cand").as("predicted"))
    base.select(col("fold"), col("doc_id"), col("label"))
      .join(pred, Seq("fold", "doc_id"))
      .groupBy("fold")
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("label") === col("predicted"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("fold"), col("n_test"), col("n_correct"),
        round(col("n_correct").cast("double") / col("n_test"), 6).as("accuracy"))
  }
}
