package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  // deterministic pseudo-random embeddings; vec 100 duplicates vec 1
  private lazy val emb = {
    val rnd = new scala.util.Random(7)
    val rows = (0L until 100L).map { id =>
      val v = Array.fill(16)(rnd.nextFloat() * 2 - 1)
      (id, v.toSeq)
    } :+ (100L, {
      val rnd2 = new scala.util.Random(7)
      val first = Array.fill(16)(rnd2.nextFloat() * 2 - 1)
      first.toSeq
    })
    rows.toDF("vec_id", "embedding")
  }

  test("cosine of a vector with itself is 1") {
    val c = emb.filter(col("vec_id") === 0)
      .select(round(Similarity.cosine(col("embedding"), col("embedding")), 9))
      .as[Double].head()
    assert(c === 1.0)
  }

  test("annTopK ranks the duplicated vector first") {
    val top = Similarity.annTopK(emb, maxQueryId = 1, k = 3)
      .filter(col("rnk") === 1).select("n_id", "cos").as[(Long, Double)].head()
    assert(top._1 === 100L)
    assert(top._2 === 1.0)
  }

  test("annIvf returns same-bucket neighbors in cosine order") {
    val out = Similarity.annIvf(emb, maxQueryId = 3, k = 5, bits = 2).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    byQ.values.foreach { rows =>
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getDouble(3)).toSeq === sorted.map(_.getDouble(3)).toSeq.sorted.reverse)
    }
  }

  test("annIvfKmeans: wellformed, deterministic, probes only its cells") {
    assumeTestdata()
    val emb2 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val a = Similarity.annIvfKmeans(emb2, maxQueryId = 5, k = 3).collect()
    val b = Similarity.annIvfKmeans(emb2, maxQueryId = 5, k = 3).collect()
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq)
    val byQ = a.groupBy(_.getLong(0))
    assert(byQ.nonEmpty)
    byQ.values.foreach { rows =>
      assert(rows.length <= 3)
      val sorted = rows.sortBy(_.getLong(2))
      assert(sorted.map(_.getDouble(3)).toSeq ===
        sorted.map(_.getDouble(3)).toSeq.sorted.reverse)
    }
  }

  test("annIvfKmeans meets a quantitative recall floor vs exact top-k") {
    assumeTestdata()
    // the annRecall query grades annIvf; this is the same gate for the
    // KMeans-quantizer variant — quality asserted vs the exact answer,
    // not just shape. nProbe=2 of 8 cells on sf0.001.
    val emb2 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val k = 5
    val exact = Similarity.annTopK(emb2, maxQueryId = 10, k = k)
      .select(col("q_id"), col("n_id"))
    val approx = Similarity.annIvfKmeans(emb2, maxQueryId = 10, k = k,
        nCells = 8, nProbe = 2)
      .select(col("q_id").as("aq"), col("n_id").as("an"))
    val total = exact.count()
    val hits = exact.join(approx,
      exact("q_id") === approx("aq") && exact("n_id") === approx("an"),
      "left_semi").count()
    val recall = hits.toDouble / total
    assert(total === 10L * k)
    // probing 2/8 cells must beat blind chance (~0.25) by a wide margin;
    // measured ≈ see assertion message on failure
    assert(recall >= 0.5, f"recall@$k = $recall%.3f — IVF quality regressed")
    graft.CacheTracker.releaseAll()
  }

  test("annIvfKmeansDet: deterministic twin is reproducible and meets the recall floor") {
    assumeTestdata()
    // B7c — the oracle-exact sibling of annIvfKmeans (md5-free: the
    // determinism comes from Lloyd init on the lowest vec_ids and
    // tie-broken folds, so two runs are bit-identical by construction).
    val emb2 = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val k = 5
    val a = Similarity.annIvfKmeansDet(emb2, maxQueryId = 10, k = k).collect()
    val b = Similarity.annIvfKmeansDet(emb2, maxQueryId = 10, k = k).collect()
    assert(a.map(_.toString).sorted.toSeq === b.map(_.toString).sorted.toSeq)
    graft.CacheTracker.releaseAll()
    val exact = Similarity.annTopK(emb2, maxQueryId = 10, k = k)
      .select(col("q_id"), col("n_id"))
    val approx = Similarity.annIvfKmeansDet(emb2, maxQueryId = 10, k = k)
      .select(col("q_id").as("aq"), col("n_id").as("an"))
    val total = exact.count()
    val hits = exact.join(approx,
      exact("q_id") === approx("aq") && exact("n_id") === approx("an"),
      "left_semi").count()
    val recall = hits.toDouble / total
    assert(recall >= 0.5, f"recall@$k = $recall%.3f — det IVF quality regressed")
    graft.CacheTracker.releaseAll()
  }

  test("nearDupPairs finds the planted duplicate, bucketed not all-pairs") {
    val pairs = Similarity.nearDupPairs(emb, cosMin = 0.99, bits = 8)
    assert(pairs.select("a_id", "b_id").as[(Long, Long)].collect().toSet === Set((0L, 100L)))
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(500))
  }

  test("docSimilarity: identical docs hit cos 1.0; cross-block pairs never meet") {
    val docs = Seq(
      (1L, "alpha beta gamma delta", "s1"),
      (2L, "alpha beta gamma delta", "s1"), // identical, same block
      (3L, "alpha beta gamma delta", "s2"), // identical but different block
      (4L, "zeta eta theta iota", "s1")     // disjoint vocabulary
    ).toDF("doc_id", "text", "source")
    val out = Similarity.docSimilarity(docs, simMin = 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(out((1L, 2L)) === 1.0)
    assert(!out.contains((1L, 3L))) // blocked apart
    assert(!out.contains((1L, 4L))) // no shared token -> pair never materializes
    val plan = Similarity.docSimilarity(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("prefix-filtered similarity is a subset of the exact join with full recall here") {
    assumeTestdata()
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val full = pairs(Similarity.docSimilarity(docs))
    graft.CacheTracker.releaseAll()
    val pruned = pairs(Similarity.docSimilarityPruned(docs))
    graft.CacheTracker.releaseAll()
    // every pruned pair exists in the exact result WITH the same cosine
    // (rescoring runs over full vectors, not the pruned ones)
    for ((k, v) <- pruned) assert(full.get(k).contains(v), s"pair $k")
    // this synthetic corpus is deliberately ANTI-Zipfian (31 tokens, all
    // frequent), so df<=N/2 pruning has near-zero recall here — the
    // real-corpus recall claim rests on Zipf, not on this data. The
    // mechanism check instead: with pruning disabled the candidate path
    // must reproduce the exact join bit-for-bit.
    val unpruned = pairs(Similarity.docSimilarityPruned(docs, maxDfFrac = 1.0))
    graft.CacheTracker.releaseAll()
    assert(unpruned === full, "maxDfFrac=1.0 must equal the exact join exactly")
  }

  test("prefix filter on a Zipfian corpus: full recall through rare tokens only") {
    // The anti-Zipfian bench corpus defeats df-pruning (documented worst
    // case, and why the adaptive skip exists). This corpus is the regime
    // the prune targets: a handful of stopwords carry most postings while
    // near-duplicate pairs share RARE tokens — the gate filters hard
    // (stopwords out: they exceed df <= N*0.5) yet recall stays exact,
    // because every qualifying pair shares at least one rare token.
    import spark.implicits._
    val stop = "the of and to in"
    val docs = (0L until 60L).map { i =>
      val pairId = (i / 2).toInt // docs 2k,2k+1 share rare tokens -> near-dups
      // letter-only tags: cleanText strips digits, so "rare0a" would
      // collapse across pairs; base-26 letters survive tokenization
      val tag = s"${('a' + pairId / 26).toChar}${('a' + pairId % 26).toChar}"
      (i, s"$stop xq${tag}one xq${tag}two xq${tag}tri", "en", "s1", 40L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    val full = pairs(Similarity.docSimilarity(docs, simMin = 0.5))
    graft.CacheTracker.releaseAll()
    val pruned = pairs(Similarity.docSimilarityPruned(docs, simMin = 0.5))
    graft.CacheTracker.releaseAll()
    assert(full.nonEmpty, "the planted near-dup pairs must score")
    assert(pruned === full, "df-pruned candidates must keep full recall on Zipf data")
    // and the gate really engaged: stopwords (df = N) are over the cap,
    // and rare tokens carry 3/8 of postings — far above the 0.05 bypass
    // floor, so the rare-token path (not the dense block-pair plan) ran
    val n = docs.count()
    val dfs = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .distinct().groupBy("token").count()
    assert(dfs.filter(col("count") > n / 2).count() === 5, "stopwords exceed the cap")
  }

  test("randomProjection roughly preserves norms (JL property)") {
    import org.apache.spark.sql.functions._
    val before = emb.select(col("vec_id"),
        aggregate(col("embedding"), lit(0.0),
          (a, x) => a + x.cast("double") * x.cast("double")).as("n2"))
    val after = Similarity.randomProjection(emb, outDims = 16)
      .groupBy("vec_id").agg(sum(col("y") * col("y")).as("p2"))
    val ratios = before.join(after, "vec_id")
      .select((col("p2") / col("n2")).as("r")).as[Double].collect()
    // chi²_16/16 concentration: every ratio in a loose band, mean near 1
    assert(ratios.forall(r => r > 0.2 && r < 3.0), s"worst=${ratios.min}/${ratios.max}")
    val mean = ratios.sum / ratios.length
    assert(mean > 0.8 && mean < 1.2, s"mean ratio $mean")
  }
}
