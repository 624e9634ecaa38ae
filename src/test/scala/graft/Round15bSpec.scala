package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-15 continuation: the native weighted-MinHash signature
  * expression (graft_wminhash_sig) that replaced the tokens×H race
  * frame, pinned bit-equal to the declarative twin it displaced. */
class Round15bSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // tf variation, repeated tokens, single-token docs, and a pair of
  // docs sharing heavy vocabulary — the shapes the race must order
  // identically on both paths.
  private val corpus = docs(
    (1L, "the cat sat on the mat the cat"),
    (2L, "the cat sat on the mat the dog"),
    (3L, "solo"),
    (4L, "a a a a a a b"),
    (5L, "b a"),
    (6L, "z y x w v u t s r q p o n m l k j i h g f e d c b a"),
    (7L, "the the the the"))

  test("wminhash signature expression is bit-equal to the declarative race frame") {
    val fast = operators.Dedup.wminhashSigArr(corpus, 16)
      .orderBy("doc_id").collect()
    val slow = operators.Dedup.wminhashSigArrDeclarative(corpus, 16)
      .orderBy("doc_id").collect()
    assert(fast.length == slow.length && fast.length == 7)
    fast.zip(slow).foreach { case (f, s) =>
      assert(f.getLong(0) == s.getLong(0))
      assert(f.getSeq[String](1) == s.getSeq[String](1),
        s"signature drift at doc ${f.getLong(0)}")
    }
  }

  test("wminhash signature expression at a non-default H and on testdata") {
    assumeTestdata()
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val fast = operators.Dedup.wminhashSigArr(d, 8).orderBy("doc_id").collect()
    val slow = operators.Dedup.wminhashSigArrDeclarative(d, 8).orderBy("doc_id").collect()
    assert(fast.length == slow.length && fast.nonEmpty)
    fast.zip(slow).foreach { case (f, s) =>
      assert(f.getSeq[String](1) == s.getSeq[String](1))
    }
  }

  test("graft_wminhash_sig SQL registration equals the Column API") {
    functions.GraftFunctions.register(spark)
    corpus.createOrReplaceTempView("r15b_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, graft_wminhash_sig(
        |  filter(split(lower(text), ' '), t -> t != ''), 16) AS sig
        |FROM r15b_docs""".stripMargin)
    // the SQL twin tokenizes with the same clean chain the operator uses:
    // these docs are already clean (lowercase alnum + single spaces)
    val viaCol = corpus.select(col("doc_id"),
      functions.GraftFunctions.wminhashSig(
        filter(split(lower(col("text")), " "), t => t =!= ""), 16).as("sig"))
    assert(viaSql.orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq ==
      viaCol.orderBy("doc_id").collect().map(_.getSeq[String](1)).toSeq)
  }

  test("wminhash pairs operator unchanged by the expression rewire") {
    // two docs sharing their heavy vocabulary and differing in rare
    // tails must still pair; the singleton must not
    val r = operators.Dedup.weightedMinhashPairs(docs(
      (1L, "the cat sat on the mat the cat sat the cat sat"),
      (2L, "the cat sat on the mat the cat sat the cat sat xyz"),
      (3L, "entirely different words here")), 16, 0.5)
      .collect()
    assert(r.forall(row => row.getLong(0) == 1L && row.getLong(1) == 2L))
  }

  test("graft_sorted_dot equals the declarative map fold bit-for-bit") {
    // entries with shared, disjoint, and prefix-overlapping tokens, plus
    // irrational weights whose products exercise the low mantissa bits
    val rows = Seq(
      (1L, 2L,
        Seq(("alpha", math.Pi), ("beta", 0.1), ("gamma", 1e-9)),
        Seq(("alpha", math.E), ("gamma", 3.3), ("zeta", 9.9))),
      (3L, 4L, Seq(("a", 1.5)), Seq(("b", 2.5))),               // disjoint
      (5L, 6L, Seq.empty[(String, Double)], Seq(("a", 1.0))),   // empty side
      (7L, 8L,
        Seq(("ab", 2.0), ("abc", 3.0)),
        Seq(("ab", 5.0), ("abcd", 7.0))))                       // prefix tokens
    val df = rows.toDF("a_id", "b_id", "a_raw", "b_raw")
      .select(col("a_id"), col("b_id"),
        sort_array(transform(col("a_raw"),
          e => struct(e.getField("_1").as("token"), e.getField("_2").as("tfidf")))).as("a_arr"),
        sort_array(transform(col("b_raw"),
          e => struct(e.getField("_1").as("token"), e.getField("_2").as("tfidf")))).as("b_arr"))
    val native = df.select(col("a_id"),
      functions.GraftFunctions.sortedDot(col("a_arr"), col("b_arr")).as("dot"))
    val declarative = df.select(col("a_id"),
      aggregate(
        transform(col("a_arr"),
          e => e.getField("tfidf") *
            coalesce(element_at(map_from_entries(col("b_arr")), e.getField("token")),
              lit(0.0))),
        lit(0.0), (acc, x) => acc + x).as("dot"))
    val n = native.orderBy("a_id").collect().map(_.getDouble(1))
    val d = declarative.orderBy("a_id").collect().map(_.getDouble(1))
    assert(n.length == 4)
    n.zip(d).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToRawLongBits(x) ==
        java.lang.Double.doubleToRawLongBits(y), s"$x != $y bitwise")
    }
  }

  test("graft_sorted_dot SQL registration works") {
    functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT graft_sorted_dot(
        |  array(struct('a', 2.0d), struct('b', 3.0d)),
        |  array(struct('b', 5.0d), struct('c', 7.0d))) AS dot""".stripMargin)
      .collect().head.getDouble(0)
    assert(r == 15.0)
  }

  // ------------------------------------------- round-15 continuation ops

  private def orders(rows: (Long, String, Double)*): DataFrame =
    rows.map { case (k, d, p) => (k, java.sql.Date.valueOf(d), p) }
      .toDF("o_orderkey", "o_orderdate", "o_totalprice")

  test("revenueDrawdown finds the worst peak-to-trough slide") {
    // revenue 100, 200, 50, 180, 40: worst dd is 200 -> 40 (0.8)
    val r = operators.Relational.revenueDrawdown(orders(
      (1L, "2024-01-01", 100.0), (2L, "2024-01-02", 200.0),
      (3L, "2024-01-03", 50.0), (4L, "2024-01-04", 180.0),
      (5L, "2024-01-05", 40.0))).collect().head
    assert(r.getAs[Long]("peak_cents") == 20000L)
    assert(r.getAs[Long]("trough_cents") == 4000L)
    assert(r.getAs[Double]("max_drawdown") == 0.8)
    assert(r.getAs[Long]("trough_day") - r.getAs[Long]("peak_day") == 3L)
  }

  test("hampelFilter flags the spike and repairs it to the window median") {
    val base = (1 to 11).map(i => (i.toLong, f"2024-01-$i%02d", 100.0))
    val spiked = base.updated(5, (6L, "2024-01-06", 5000.0))
    val r = operators.Relational.hampelFilter(orders(spiked: _*))
      .orderBy("day_idx").collect()
    assert(r.length == 11)
    val flagged = r.filter(_.getAs[Boolean]("is_outlier"))
    assert(flagged.length == 1)
    assert(flagged.head.getAs[Long]("cents") == 500000L)
    assert(flagged.head.getAs[Double]("repaired_cents") == 10000.0)
    // constant neighborhoods: MAD 0, non-spike days not flagged
    assert(r.count(x => !x.getAs[Boolean]("is_outlier")) == 10)
  }

  test("powerAnalysis: hand-checked n for p=0.4 vs 0.6") {
    import org.apache.spark.sql.functions.{lit => l}
    // 10 users per arm: A (even ids) converts 4/10, B converts 6/10
    val evs = (0L until 20L).flatMap { u =>
      val conv = if (u % 2 == 0) (u / 2) < 4 else (u / 2) < 6
      Seq((u, "2024-01-01 00:00:00", if (conv) "purchase" else "click"))
    }.toDF("user_id", "ts_s", "event_type")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        col("event_type"), l(1.0).as("value"))
    val r = operators.Relational.powerAnalysis(evs).collect().head
    assert(r.getAs[Double]("p_a") == 0.4 && r.getAs[Double]("p_b") == 0.6)
    // n = (1.959964*sqrt(2*.5*.5) + 0.841621*sqrt(.24+.24))^2 / .04 = ~96.2
    assert(r.getAs[Long]("n_per_arm_req") == 97L)
  }

  test("kruskalWallis: identical groups give H ~ 0 and correct tie correction") {
    val d = docs(
      (1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"), (6L, "f"))
      .withColumn("lang", when(col("doc_id") % 2 === 0, "en").otherwise("de"))
      .withColumn("n_chars", col("doc_id") % 3) // values 1,2,0,1,2,0 - full ties across groups
    val r = operators.TextOps.kruskalWallis(d).collect().head
    assert(r.getAs[Long]("n_docs") == 6L && r.getAs[Long]("n_groups") == 2L)
    // both groups hold {0,1,2}: rank sums equal, H == 0 exactly
    assert(r.getAs[Double]("h_stat") == 0.0)
  }

  test("adamicAdar scores open wedges only, nano-exact") {
    // adjacency chain "x y", "y z" repeated: edges x-y, y-z; open pair
    // (x, z) with common neighbor y of degree 2 -> score = 1/ln(2)
    val d = docs(
      (1L, "x y"), (2L, "y z"), (3L, "x y"), (4L, "y z"))
    val r = operators.Graph.adamicAdar(d, minEdgeFrac = 0.25, minCommon = 1L)
      .collect()
    assert(r.length == 1)
    assert(r.head.getString(0) == "x" && r.head.getString(1) == "z")
    assert(r.head.getAs[Long]("n_common") == 1L)
    assert(r.head.getAs[Double]("aa_score") ==
      math.round(math.rint(1.0 / math.log(2.0) * 1e9) / 1e3) / 1e6)
  }

  test("caliperMatch: nearest control within caliper, with-replacement ATT") {
    // day0 = 0; pre = days 0-14, post = days 15+. treated 1 (pre 100.00)
    // matches control 2 (pre 101.00, dist 100) over control 4 (pre 150.00);
    // treated 3 (pre 900.00) has no control within 200.00 caliper
    val evs = Seq(
      (1L, "2024-01-01 00:00:00", 100.0), (1L, "2024-01-20 00:00:00", 50.0),
      (2L, "2024-01-01 00:00:00", 101.0), (2L, "2024-01-20 00:00:00", 30.0),
      (4L, "2024-01-01 00:00:00", 150.0), (4L, "2024-01-20 00:00:00", 99.0),
      (3L, "2024-01-01 00:00:00", 900.0), (3L, "2024-01-20 00:00:00", 10.0))
      .toDF("user_id", "ts_s", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp").as("ts"),
        lit("click").as("event_type"), col("value"))
    val r = operators.Relational.caliperMatch(evs).collect().head
    assert(r.getAs[Long]("n_treated") == 2L)
    assert(r.getAs[Long]("n_matched") == 1L)
    assert(r.getAs[Double]("att_dollars") == 20.0)  // 50 - 30
    assert(r.getAs[Double]("avg_match_dist_dollars") == 1.0)
  }

  test("pqAnnRecall: perfect codebook gives recall 1, degenerate corpus shapes hold") {
    // 8 orthogonal-ish 64-dim vectors in 2 tight clusters: PQ with k=4
    // codes per sub easily separates them, so ADC ranking ~= exact
    val emb = (0L until 8L).map { i =>
      val base = Array.fill(64)(0.001f)
      base((i % 2).toInt) = if (i < 4) 1.0f else -1.0f
      base(2 + (i % 2).toInt) = i.toFloat / 10
      (i, base.toSeq, (i % 2).toInt)
    }.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("label"))
    val r = operators.Similarity.pqAnnRecall(emb, maxQueryId = 4, k = 3)
      .orderBy("q_id").collect()
    assert(r.length == 4)
    assert(r.forall(x => x.getAs[Double]("recall") >= 0.0 &&
      x.getAs[Double]("recall") <= 1.0))
    assert(r.forall(x => x.getAs[Long]("n_hits") ==
      math.round(x.getAs[Double]("recall") * 3)))
  }

  test("graft_lcs_len: hand-checked LCS values incl. empty and repeated tokens") {
    functions.GraftFunctions.register(spark)
    val cases = Seq(
      ("a b c d", "a x c y", 2L),        // a, c
      ("x y", "y x", 1L),                // either single token
      ("a a b a", "a b a a", 3L),        // a b a (or a a a)
      ("q", "z", 0L),
      ("same same", "same same", 2L))
    cases.foreach { case (a, b, want) =>
      val got = spark.sql(
        s"SELECT graft_lcs_len(split('$a', ' '), split('$b', ' ')) AS l")
        .collect().head.getLong(0)
      assert(got == want, s"lcs($a, $b) = $got, want $want")
    }
  }

  test("rougeLPairs: identical docs in a band score F1 = 1") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val r = operators.Dedup.rougeLPairs(docs((1L, text), (2L, text)))
      .collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("lcs") == 12L)
    assert(r.head.getAs[Double]("rouge_f") == 1.0)
    assert(r.head.getAs[Double]("rouge_p") == 1.0 &&
      r.head.getAs[Double]("rouge_r") == 1.0)
  }

  test("clusterPurity: label-aligned clusters give purity 1 and NMI 1") {
    // 8 vectors in 2 crisp clusters whose labels match the clusters;
    // k=2 over 8 dims, seeds vec_id<2 land one in each cluster
    val emb = (0L until 8L).map { i =>
      val e = Array.fill(8)(0.0f)
      e(0) = if (i % 2 == 0) 10.0f else -10.0f
      e(1) = i.toFloat / 100
      (i, e.toSeq, (i % 2).toInt)
    }.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"), col("label"))
    val r = operators.Similarity.clusterPurity(emb, k = 2, dims = 8, iters = 2)
      .collect().head
    assert(r.getAs[Long]("n_vecs") == 8L)
    assert(r.getAs[Double]("purity") == 1.0)
    assert(r.getAs[Double]("nmi") == 1.0)
  }

  test("groupKfold: folds partition sources, counts add up") {
    val d = (1L to 40L).map(i => (i, s"text $i", "en", s"src${i % 8}", 6L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.TextOps.groupKfold(d, k = 3).collect()
    assert(r.map(_.getAs[Long]("n_docs")).sum == 40L)
    assert(r.map(_.getAs[Long]("n_sources")).sum == 8L) // no source in 2 folds
    assert(r.forall(x => x.getAs[Long]("fold") >= 0 && x.getAs[Long]("fold") < 3))
  }

  test("isotonicCalibration: fit is monotone and pools violating bins") {
    val r = operators.Eval.isotonicCalibration(
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet"))
      .orderBy("bin").collect()
    assume(r.nonEmpty)
    val fits = r.map(_.getAs[Double]("iso_fit"))
    assert(fits.zip(fits.tail).forall { case (a, b) => a <= b }, "fit not monotone")
    // weighted mean is preserved by PAV pooling (up to 6dp rounding of members)
    val n = r.map(_.getAs[Long]("n"))
    val wfit = fits.zip(n).map { case (f, c) => f * c }.sum / n.sum
    val wobs = r.map(x => x.getAs[Double]("frac_pos") * x.getAs[Long]("n")).sum / n.sum
    assert(math.abs(wfit - wobs) < 1e-4)
  }

  test("repeatSpanProfile: hand-built repeats at each dyadic length") {
    val d = docs(
      (1L, "a b a b x"),                        // "a b" repeats -> span 2
      (2L, "p q r s p q r s tail"),             // 4-span repeats
      (3L, "all distinct tokens here now"),     // none
      (4L, "w w w w w w w w w w"))              // 8-span repeats (all same)
    val r = operators.TextOps.repeatSpanProfile(d)
      .collect().map(x => x.getLong(0) -> x.getLong(2)).toMap
    assert(r(1L) == 2L && r(2L) == 4L && r(3L) == 0L && r(4L) == 8L)
  }

  test("shardRebalancePlan: bins are contiguous and cover all bytes") {
    val d = (1L to 90L).map(i => (i, "t", "en", s"s${i % 9}", i))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.Relational.shardRebalancePlan(d, nTarget = 3).collect()
    assert(r.map(_.getAs[Long]("n_shards")).sum == 9L)
    assert(r.map(_.getAs[Long]("n_bytes")).sum == (1L to 90L).sum)
    assert(r.forall(x => x.getAs[Long]("target_file") >= 0 &&
      x.getAs[Long]("target_file") < 3))
  }

  test("markovStationary: two-state deterministic cycle converges to uniform") {
    val evs = (0 until 40).map { i =>
      (i.toLong, f"2024-01-01 00:${i}%02d:00",
        1L, if (i % 2 == 0) "click" else "view", 1.0)
    }.toDF("event_id", "ts_s", "user_id", "event_type", "value")
      .select(col("event_id"), col("ts_s").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val r = operators.Sessionize.markovStationary(evs)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // click -> view -> click ... : stationary = (0.5, 0.5)
    assert(r("click") == 0.5 && r("view") == 0.5)
  }

  test("embedLabelDrift: identical halves give drift_cos 1") {
    val emb = (0L until 8L).map { i =>
      // halves mirror each other: vec 2j and 2j+1 identical
      val e = Array.tabulate(8)(d => ((i / 2) + d + 1).toFloat)
      (i, e.toSeq, (i % 2).toInt * 0 + (i / 4).toInt)
    }.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"),
        col("label"))
    val r = operators.Similarity.embedLabelDrift(emb).collect()
    assert(r.nonEmpty)
    r.foreach(x => assert(x.getAs[Double]("drift_cos") > 0.999))
  }

  test("cvAccuracy: separable vocabulary per label scores ~perfectly") {
    // 3 sources per fold-ish; label-exclusive vocab => complement models
    // always classify the held-out fold right
    val d = (1L to 60L).map { i =>
      val lang = if (i % 2 == 0) "en" else "de"
      val text = if (lang == "en") "alpha beta gamma alpha" else "uno dos tres uno"
      (i, text, lang, s"src${i % 6}", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = graft.ml.NaiveBayesSql.cvAccuracy(d, k = 3).collect()
    assert(r.map(_.getAs[Long]("n_test")).sum == 60L)
    r.foreach(x => assert(x.getAs[Double]("accuracy") == 1.0))
  }

  test("lDiversity flags sensitive-homogeneous groups") {
    val d = (1L to 20L).map { i =>
      // lang 'de' groups all come from ONE source -> violate l=3
      val lang = if (i <= 10) "en" else "de"
      val src = if (lang == "en") s"s${i % 5}" else "lonesource"
      (i, "t", lang, src, 150L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.TextOps.lDiversity(d).collect()
      .map(x => x.getString(0) -> x.getAs[Boolean]("violates_l")).toMap
    assert(!r("en") && r("de"))
  }

  test("Theil decomposition identity: sum of parts equals the global index") {
    assumeTestdata("/root/testdata/sf0.01")
    val orders = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
    val customer = spark.read.parquet("/root/testdata/sf0.01/customer.parquet")
    val global = operators.Relational.spendTheil(orders)
      .collect().head.getAs[Double]("theil_t")
    val parts = operators.Relational.spendTheilDecomp(orders, customer).collect()
    val reassembled = parts.map(p =>
      p.getAs[Double]("spend_share") * p.getAs[Double]("theil_within")
        + p.getAs[Double]("between_term")).sum
    assert(math.abs(global - reassembled) < 1e-4,
      s"decomposition broke: $global vs $reassembled")
  }

  test("wminhash signature plan is shuffle-free") {
    val plan = operators.Dedup.wminhashSigArr(corpus, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a narrow plan, got:\n$plan")
  }
}
