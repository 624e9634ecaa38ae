package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 third-session operators: the classical-statistics batch
  * (ARI, decile tau-b, Theil's U, Brown–Forsythe, Cochran's Q). */
class Round16cSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*): DataFrame =
    rows.map { case (id, text, lang, source) =>
      (id, text, lang, source, text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")

  test("adjustedRand: hand-checked contingency on two separable clusters") {
    // k=2 init = vec_ids 0,1 -> one per true cluster; labels corrupt one doc
    val emb = Seq(
      (0L, Array(0.0f, 0.0f), 0),
      (1L, Array(10.0f, 10.0f), 1),
      (2L, Array(0.1f, 0.0f), 0),
      (3L, Array(0.0f, 0.1f), 1), // the corrupted label
      (4L, Array(10.1f, 10.0f), 1),
      (5L, Array(10.0f, 10.1f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = operators.Similarity.adjustedRand(emb, k = 2, dims = 2).collect().head
    // cells: (c0,l0)=2 (c0,l1)=1 (c1,l1)=3 -> index=1+0+3=4, a=6, b=1+6=7
    // expected=6*7/15=2.8, max=6.5, ari=1.2/3.7
    assert(r.getAs[Long]("index_sum") == 4L)
    assert(r.getAs[Long]("comb_a") == 6L)
    assert(r.getAs[Long]("comb_b") == 7L)
    assert(math.abs(r.getAs[Double]("ari") - 1.2 / 3.7) < 1e-6)
    CacheTracker.drainAll(spark)
  }

  test("adjustedRand: perfect label agreement scores exactly 1") {
    val emb = Seq(
      (0L, Array(0.0f, 0.0f), 0),
      (1L, Array(10.0f, 10.0f), 1),
      (2L, Array(0.1f, 0.0f), 0),
      (3L, Array(10.1f, 10.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val r = operators.Similarity.adjustedRand(emb, k = 2, dims = 2).collect().head
    assert(r.getAs[Double]("ari") == 1.0)
    CacheTracker.drainAll(spark)
  }

  test("kendallTau matches a brute-force decile tau-b on real docs") {
    assumeTestdata()
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = operators.TextOps.kendallTau(d).collect().head
    // brute force: replicate ntile-by-(value, doc_id) locally, count pairs
    val rows = d.select(col("doc_id").cast("long"), col("n_chars").cast("long"),
        expr("""round(
          (CASE WHEN length(text) >= 20 THEN 1.0 ELSE length(text) / 20.0 END)
          * (1.0 - CASE WHEN length(text) > 0
              THEN size(regexp_extract_all(text, '[^a-zA-Z0-9\\s]', 0)) / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END)
          * (CASE WHEN size(filter(split(text, '\\s+'), t -> t <> '')) > 0
              THEN least(1.0,
                size(filter(split(text, '\\s+'), t -> lower(t) IN ('the','a','an','and','or','of','to','in','is','it')))
                / CAST(size(filter(split(text, '\\s+'), t -> t <> '')) AS DOUBLE) * 5.0 + 0.5)
              ELSE 0.0 END), 6)"""))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val n = rows.length
    def ntile10(order: Array[Long]): Map[Long, Int] = {
      val q = n / 10; val rem = n % 10
      order.zipWithIndex.map { case (id, i) =>
        val bucket = if (i < (q + 1) * rem) i / (q + 1) else rem + (i - (q + 1) * rem) / q
        id -> (bucket + 1)
      }.toMap
    }
    val dq = ntile10(rows.sortBy(r => (r._3, r._1)).map(_._1))
    val dl = ntile10(rows.sortBy(r => (r._2, r._1)).map(_._1))
    var conc = 0L; var disc = 0L
    val ids = rows.map(_._1)
    for (i <- ids.indices; j <- (i + 1) until ids.length) {
      val (a, b) = (ids(i), ids(j))
      val sq = Integer.compare(dq(a), dq(b)); val sl = Integer.compare(dl(a), dl(b))
      if (sq * sl > 0) conc += 1 else if (sq * sl < 0) disc += 1
    }
    assert(got.getAs[Long]("n_docs") == n.toLong)
    assert(got.getAs[Long]("concordant") == conc,
      s"concordant ${got.getAs[Long]("concordant")} want $conc")
    assert(got.getAs[Long]("discordant") == disc)
    val tau = got.getAs[Double]("tau_b")
    assert(tau >= -1.0 && tau <= 1.0)
    CacheTracker.drainAll(spark)
  }

  test("theilU: perfect association scores 1 both ways, independence 0") {
    val perfect = docs(
      (1L, "aa", "en", "web"), (2L, "bb", "en", "web"),
      (3L, "cc", "de", "book"), (4L, "dd", "de", "book"))
    val p = operators.TextOps.theilU(perfect).collect().head
    assert(p.getAs[Double]("u_lang_given_source") == 1.0)
    assert(p.getAs[Double]("u_source_given_lang") == 1.0)
    val indep = docs(
      (1L, "aa", "en", "web"), (2L, "bb", "en", "book"),
      (3L, "cc", "de", "web"), (4L, "dd", "de", "book"))
    val i = operators.TextOps.theilU(indep).collect().head
    assert(math.abs(i.getAs[Double]("u_lang_given_source")) < 1e-5)
    assert(math.abs(i.getAs[Double]("u_source_given_lang")) < 1e-5)
  }

  test("brownForsythe: hand-checked F on same-median different-spread groups") {
    val d = Seq(
      (1L, "a", "en", "flat", 10L), (2L, "b", "en", "flat", 10L),
      (3L, "c", "en", "flat", 10L),
      (4L, "d", "en", "spread", 5L), (5L, "e", "en", "spread", 10L),
      (6L, "f", "en", "spread", 15L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.TextOps.brownForsythe(d).collect().head
    // z: flat (0,0,0), spread (5,0,5); ssb=2*(25/9*3)=50/3, ssw=50/3
    // F = (50/3 / 1) / (50/3 / 4) = 4
    assert(r.getAs[Long]("k_groups") == 2L)
    assert(r.getAs[Long]("n_docs") == 6L)
    assert(math.abs(r.getAs[Double]("f_stat") - 4.0) < 1e-4)
  }

  test("selfBleu: identical docs score 1, disjoint docs score 0") {
    val same = docs(
      (1L, "the cat sat on the mat", "en", "web"),
      (2L, "the cat sat on the mat", "en", "web"))
    val s = operators.Eval.selfBleu(same).collect().head
    assert(s.getAs[Long]("n_pairs") == 2L)
    assert(s.getAs[Double]("self_bleu") == 1.0)
    val disjoint = docs(
      (1L, "alpha beta gamma delta", "en", "web"),
      (2L, "epsilon zeta eta theta", "en", "web"))
    val d = operators.Eval.selfBleu(disjoint).collect().head
    assert(d.getAs[Double]("self_bleu") == 0.0)
    CacheTracker.drainAll(spark)
  }

  test("selfBleu: one-word substitution pair is penalized but nonzero") {
    val r = operators.Eval.selfBleu(docs(
      (1L, "the cat sat on the mat today", "en", "web"),
      (2L, "the dog sat on the mat today", "en", "web"))).collect().head
    // p1 = 6/7, p2 = 4/6 per direction (symmetric lengths -> BP = 1)
    val want = math.sqrt((6.0 / 7) * (4.0 / 6))
    assert(math.abs(r.getAs[Double]("self_bleu") - want) < 1e-5)
    CacheTracker.drainAll(spark)
  }

  test("bitmapOverlapMatrix reproduces the set-join overlap matrix exactly") {
    assumeTestdata()
    val ev = SparkEntry.normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val key = Seq("type_a", "type_b")
    val bm = operators.Sketches.bitmapOverlapMatrix(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"),
          r.getAs[Double]("jaccard"))).toMap
    val sj = operators.Relational.userOverlapJaccard(ev)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"), r.getAs[Long]("n_both"),
          r.getAs[Double]("jaccard"))).toMap
    assert(bm.keySet == sj.keySet)
    assert(bm == sj)
    assert(bm.nonEmpty)
  }

  test("videoFrames: stride and cap arithmetic on a crafted payload") {
    // 300 ASCII bytes -> 10 frames of 32B (last short), sampled 0,2,4,6
    val d = docs((1L, "x" * 300, "en", "web"))
    val rows = operators.Multimodal.videoFrames(d).collect()
      .sortBy(_.getAs[Long]("frame_idx"))
    assert(rows.map(_.getAs[Long]("frame_idx")).toSeq == Seq(0L, 2L, 4L, 6L))
    assert(rows.forall(_.getAs[Long]("n_frames_total") == 10L))
    assert(rows.forall(_.getAs[Long]("frame_bytes") == 32L))
    // identical content -> identical frame hash
    assert(rows.map(_.getAs[String]("frame_hash")).distinct.length == 1)
    // short payload: 40 bytes -> 2 frames, sample frame 0 only
    val short = operators.Multimodal.videoFrames(docs((2L, "y" * 40, "en", "web")))
      .collect()
    assert(short.length == 1 && short.head.getAs[Long]("frame_idx") == 0L)
  }

  test("vMeasure: perfect clustering scores 1/1/1; merging labels drops completeness only") {
    val perfect = Seq(
      (0L, Array(0.0f, 0.0f), 0), (1L, Array(10.0f, 10.0f), 1),
      (2L, Array(0.1f, 0.0f), 0), (3L, Array(10.1f, 10.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val p = operators.Similarity.vMeasure(perfect, k = 2, dims = 2).collect().head
    assert(p.getAs[Double]("homogeneity") == 1.0)
    assert(p.getAs[Double]("completeness") == 1.0)
    assert(p.getAs[Double]("v_measure") == 1.0)
    // k=2 clusters but 4 labels: every cluster is pure-impossible to
    // split, so homogeneity < 1 is impossible... labels finer than
    // clusters => homogeneity falls, completeness stays 1
    val fine = Seq(
      (0L, Array(0.0f, 0.0f), 0), (1L, Array(10.0f, 10.0f), 2),
      (2L, Array(0.1f, 0.0f), 1), (3L, Array(10.1f, 10.0f), 3)
    ).toDF("vec_id", "embedding", "label")
    val f = operators.Similarity.vMeasure(fine, k = 2, dims = 2).collect().head
    assert(f.getAs[Double]("homogeneity") < 1.0)
    assert(f.getAs[Double]("completeness") == 1.0)
    CacheTracker.drainAll(spark)
  }

  test("runsTest matches a local recomputation of runs and z on real docs") {
    assumeTestdata()
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = operators.TextOps.runsTest(d).collect().head
    val rows = d.select(col("doc_id").cast("long"), col("source"),
        md5(concat(col("doc_id").cast("string"), lit(":42"))).as("skey"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val major = rows.groupBy(_._2).view.mapValues(_.size).toSeq
      .sortBy { case (s, c) => (-c, s) }.head._1
    val seq = rows.sortBy(r => (r._3, r._1)).map(r => r._2 == major)
    val runs = 1 + seq.sliding(2).count(w => w(0) != w(1))
    val n = seq.length.toDouble; val n1 = seq.count(identity).toDouble
    val mu = 2.0 * n1 * (n - n1) / n + 1.0
    val z = (runs - mu) / math.sqrt((mu - 1.0) * (mu - 2.0) / (n - 1.0))
    assert(got.getAs[Long]("n_runs") == runs.toLong)
    assert(math.abs(got.getAs[Double]("z_stat") - z) < 1e-4)
    CacheTracker.drainAll(spark)
  }

  test("hillNumbers: uniform vocabulary hits q0 = hill1 = hill2, evenness 1") {
    // 4 distinct tokens, once each: H = ln 4, Simpson = 16/4 = 4
    val d = docs((1L, "alpha beta gamma delta", "en", "uni"))
    val r = operators.TextOps.hillNumbers(d).collect().head
    assert(r.getAs[Long]("q0") == 4L)
    assert(math.abs(r.getAs[Double]("hill1") - 4.0) < 1e-4)
    assert(r.getAs[Double]("hill2") == 4.0)
    assert(r.getAs[Double]("pielou_evenness") == 1.0)
    // skewed: 3x one token + 1 other -> hill2 = 16/10 = 1.6
    val s = operators.TextOps.hillNumbers(
      docs((1L, "foo foo foo bar", "en", "skew"))).collect().head
    assert(s.getAs[Double]("hill2") == 1.6)
    assert(s.getAs[Double]("hill1") < 2.0 && s.getAs[Double]("hill1") > 1.0)
  }

  test("tokenMassPercentiles: hand-checked crossings on a skewed fixture") {
    // docs 1-3: 4 chars / 2 tokens each; doc 4: 28 chars / 7 tokens.
    // total 13 tokens; cum by (n_chars, doc_id): 2, 4, 6, 13
    val d = docs(
      (1L, "a bb", "en", "web"),
      (2L, "c dd", "en", "web"),
      (3L, "e ff", "en", "web"),
      (4L, "g h i j k l mmmmmmmmmmmmmmmm", "en", "web"))
    val r = operators.TextOps.tokenMassPercentiles(d).collect()
      .map(x => x.getAs[Long]("pct") -> x.getAs[Long]("chars_at_pct")).toMap
    assert(r(25L) == 4L)  // cum 4 ≥ 25% of 13 (3.25) -> a 4-char doc
    assert(r(50L) == 28L) // cum 6 < 6.5: only the 28-char doc crosses
    assert(r(90L) == 28L)
    CacheTracker.drainAll(spark)
  }

  test("skylineDocs: no result row is dominated and all dominators survive") {
    assumeTestdata()
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val sky = operators.TextOps.skylineDocs(d).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality"),
        r.getAs[Long]("n_chars")))
    assert(sky.nonEmpty)
    val all = operators.TextOps.qualityScore(d)
      .join(d.select(col("doc_id"), col("n_chars")), "doc_id")
      .select(col("doc_id").cast("long"), col("quality"), col("n_chars").cast("long"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    def dominates(p: (Long, Double, Long), q: (Long, Double, Long)): Boolean =
      p._2 >= q._2 && p._3 >= q._3 && (p._2 > q._2 || p._3 > q._3)
    // brute-force skyline over the full corpus == operator output (as sets)
    val want = all.filter(q => !all.exists(p => dominates(p, q))).map(_._1).toSet
    assert(sky.map(_._1).toSet == want)
    CacheTracker.drainAll(spark)
  }

  test("communityModularity: two disconnected cliques score high Q, one clique scores 0") {
    // two 3-cliques via adjacent bigrams: docs walk each clique's edges
    val twoCliques = docs(
      (1L, "aa bb cc aa cc bb aa", "en", "web"),
      (2L, "xx yy zz xx zz yy xx", "en", "web"))
    val r = operators.Graph.communityModularity(twoCliques).collect().head
    assert(r.getAs[Long]("n_communities") == 2L)
    assert(r.getAs[Long]("n_edges") == 6L)
    // perfect 2-community split of 2 cliques: Q = 1/2
    assert(math.abs(r.getAs[Double]("modularity") - 0.5) < 1e-6)
    val oneClique = operators.Graph.communityModularity(
      docs((1L, "aa bb cc aa cc bb aa", "en", "web"))).collect().head
    assert(oneClique.getAs[Long]("n_communities") == 1L)
    assert(math.abs(oneClique.getAs[Double]("modularity")) < 1e-6)
    CacheTracker.drainAll(spark)
  }

  test("attributionPosition: weights are U-shaped and credit sums to the purchase") {
    import java.sql.Timestamp
    def ts(min: Int) = new Timestamp(1700000000000L + min * 60000L)
    // one purchase at t=100min, clicks at 10/20/30/40 min: 4 touches
    val ev = Seq(
      (1L, ts(10), 7L, "click", 0.0, "{}"),
      (2L, ts(20), 7L, "click", 0.0, "{}"),
      (3L, ts(30), 7L, "click", 0.0, "{}"),
      (4L, ts(40), 7L, "click", 0.0, "{}"),
      (5L, ts(100), 7L, "purchase", 10.0, "{}")
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Sessionize.attributionPosition(ev).collect()
    // first (40%) and last (40%) get 400 cents, two middles 100 each
    val total = r.map(_.getAs[Double]("attributed_value")).sum
    assert(math.abs(total - 1000.0) < 0.01)
    assert(r.map(_.getAs[Long]("n_touches")).sum == 4L)
    CacheTracker.drainAll(spark)
  }

  test("interpJoin: midnight event reads the day mark exactly, last day is NULL") {
    assumeTestdata()
    val ev = SparkEntry.normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val r = operators.AsOf.interpJoin(ev)
    val daily = ev.groupBy(expr("unix_micros(ts) div 86400000000").as("day_idx"))
      .agg(expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)").as("cents"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val rows = r.collect()
    assert(rows.nonEmpty)
    val lastDay = daily.keys.max
    rows.foreach { x =>
      val d = x.getAs[Long]("day_idx"); val f = x.getAs[Double]("frac")
      (daily.get(d), daily.get(d + 1)) match {
        case (Some(r0), Some(r1)) =>
          val want = r0 + (r1 - r0).toDouble * f
          // frac in output is 9dp-rounded; recompute bound loosely
          assert(math.abs(x.getAs[Double]("interp_cents") - want) < 1.0)
        case _ =>
          assert(x.isNullAt(x.fieldIndex("interp_cents")),
            s"day $d (last=$lastDay) should be NULL without both marks")
      }
    }
    CacheTracker.drainAll(spark)
  }

  test("cliffsDelta: consistent with mannwhitneyU's U and bounded in [-1, 1]") {
    assumeTestdata()
    val ev = SparkEntry.normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val cd = operators.Relational.cliffsDelta(ev).collect().head
    val mw = operators.Relational.mannwhitneyU(ev).collect().head
    val m = cd.getAs[Long]("n_a").toDouble; val n = cd.getAs[Long]("n_b").toDouble
    val fromU = 2.0 * mw.getAs[Double]("u_stat") / (m * n) - 1.0
    assert(math.abs(cd.getAs[Double]("delta") - fromU) < 1e-5)
    assert(math.abs(cd.getAs[Double]("delta")) <= 1.0)
    CacheTracker.drainAll(spark)
  }

  test("durbinWatson: alternating residuals push DW toward 4, trend toward 2-ish") {
    import java.sql.Timestamp
    def ev(day: Int, v: Double) =
      (day.toLong, new Timestamp(1700000000000L + day * 86400000L), day.toLong,
        "purchase", v, "{}")
    // perfectly alternating around a flat trend: e_t = ±c, DW -> 4
    val alt = (0 until 40).map(d => ev(d, if (d % 2 == 0) 10.0 else 20.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Relational.durbinWatson(alt).collect().head
    assert(r.getAs[Long]("n_days") == 40L)
    assert(r.getAs[Double]("dw") > 3.5, s"dw = ${r.getAs[Double]("dw")}")
    CacheTracker.drainAll(spark)
  }

  test("gumbelMax: location below mean, return level above all but extremes") {
    assumeTestdata()
    val ev = SparkEntry.normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val r = operators.Relational.gumbelMax(ev).collect().head
    val mean = r.getAs[Double]("mean_max")
    assert(r.getAs[Double]("gumbel_loc") < mean)
    assert(r.getAs[Double]("return_level_30d") > mean)
    assert(r.getAs[Double]("gumbel_scale") > 0.0)
    CacheTracker.drainAll(spark)
  }

  test("negbinFit: hand-checked moments and Poisson degenerate case") {
    // source 'od': counts 1, 5 -> mean 3, var 8, ratio 8/3, r = 9/5, p = 3/8
    val d = docs(
      (1L, "one", "en", "od"), (2L, "a b c d e", "en", "od"),
      // source 'ud': counts 2, 2 -> var 0 -> NULL r/p
      (3L, "a b", "en", "ud"), (4L, "c d", "en", "ud"))
    val r = operators.TextOps.negbinFit(d).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    val od = r("od")
    assert(od.getAs[Double]("mean_tokens") == 3.0)
    assert(od.getAs[Double]("var_tokens") == 8.0)
    assert(math.abs(od.getAs[Double]("nb_r") - 1.8) < 1e-6)
    assert(math.abs(od.getAs[Double]("nb_p") - 0.375) < 1e-6)
    val ud = r("ud")
    assert(ud.isNullAt(ud.fieldIndex("nb_r")))
    assert(ud.isNullAt(ud.fieldIndex("nb_p")))
  }

  test("moodMedian: identical length distributions give chi2 ~ 0, split gives large chi2") {
    val same = docs(
      (1L, "aaaa", "en", "s1"), (2L, "bbbbbbbb", "en", "s1"),
      (3L, "cccc", "en", "s2"), (4L, "dddddddd", "en", "s2"))
    val r = operators.TextOps.moodMedian(same).collect().head
    assert(r.getAs[Double]("chi2") == 0.0)
    assert(r.getAs[Long]("dof") == 1L)
    // s1 all short, s2 all long -> maximal separation: chi2 = n = 4
    val split = docs(
      (1L, "aa", "en", "s1"), (2L, "bb", "en", "s1"),
      (3L, "cccccccc", "en", "s2"), (4L, "dddddddd", "en", "s2"))
    val s = operators.TextOps.moodMedian(split).collect().head
    assert(s.getAs[Double]("chi2") == 4.0)
  }

  test("jarqueBera matches a local moment recomputation on real docs") {
    assumeTestdata()
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = operators.TextOps.jarqueBera(d).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val rows = d.filter(col("n_chars") > 0)
      .select(col("lang"), col("n_chars").cast("double"))
      .collect().map(r => (r.getString(0), math.log(r.getDouble(1))))
    rows.groupBy(_._1).foreach { case (lang, xs0) =>
      val xs = xs0.map(x => BigDecimal(x._2).setScale(9,
        BigDecimal.RoundingMode.HALF_UP).toDouble)
      val n = xs.length.toDouble
      if (n > 3) {
        val mu = xs.sum / n
        val m2 = xs.map(x => x * x).sum / n - mu * mu
        val m3 = xs.map(x => x * x * x).sum / n - 3 * mu * (xs.map(x => x * x).sum / n) + 2 * mu * mu * mu
        val m4 = xs.map(x => x * x * x * x).sum / n - 4 * mu * (xs.map(x => x * x * x).sum / n) +
          6 * mu * mu * (xs.map(x => x * x).sum / n) - 3 * mu * mu * mu * mu
        val skew = m3 / math.sqrt(m2 * m2 * m2)
        val exk = m4 / (m2 * m2) - 3.0
        val jb = n / 6.0 * (skew * skew + exk * exk / 4.0)
        val g = got(lang)
        assert(math.abs(g.getAs[Double]("skewness") - skew) < 1e-4, s"$lang skew")
        assert(math.abs(g.getAs[Double]("jb_stat") - jb) < 1e-3, s"$lang jb")
      }
    }
    CacheTracker.drainAll(spark)
  }

  test("embedMmd: identical groups score ~0, shifted groups score the shift") {
    // labels 0/1 identical distributions (paired vectors), label 2 shifted
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 0),
      (2L, Array(1.0f, 0.0f), 1), (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(11.0f, 10.0f), 2), (5L, Array(10.0f, 11.0f), 2)
    ).toDF("vec_id", "embedding", "label")
    val r = operators.Similarity.embedMmd(emb, dims = 2).collect()
      .map(x => (x.getAs[Long]("label_a"), x.getAs[Long]("label_b")) ->
        x.getAs[Double]("mmd2")).toMap
    // identical empirical distributions: unbiased MMD^2 = -within-var bias
    // For {e1, e2} vs {e1, e2}: |S|^2 - Q = (1+1)... hand: S=(1,1), |S|^2=2,
    // Q=2 -> per-group term 0; dot=2 -> mmd2 = 0 + 0 - 2*2/4 = -1
    assert(math.abs(r((0L, 1L)) - (-1.0)) < 1e-6)
    // shifted group: large positive
    assert(r((0L, 2L)) > 100.0)
    assert(r((1L, 2L)) > 100.0)
  }

  test("simpsonsParadox: constructed flip is detected") {
    // within each lang quality falls with length, pooled rises:
    // lang A short docs low quality, lang B long docs high quality
    // with within-group negative slope. Use n_chars built from text len.
    val d = Seq(
      // lang A: lengths 10/20, quality micro proxy via stopword-free text
      (1L, "zz " * 3 + "the of", "a", "s", 12L),
      (2L, "zz " * 8, "a", "s", 24L),
      (3L, "the of and is it to in a an or", "b", "s", 500L),
      (4L, "the of and is it", "b", "s", 510L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.TextOps.simpsonsParadox(d).collect().head
    assert(r.getAs[Long]("n_docs") == 4L)
    assert(r.getAs[Long]("n_groups") == 2L)
    // structural checks: flips counted consistently with the slopes
    assert(r.getAs[Long]("n_sign_flips") >= 0L)
    CacheTracker.drainAll(spark)
  }

  test("revenueVar: hand-checked VaR and CVaR on a crafted delta series") {
    import java.sql.Timestamp
    // 41 days => 40 deltas; ceil(40*0.05)=2 -> var95 = 2nd smallest delta
    def ev(day: Int, v: Double) =
      (day.toLong, new Timestamp(1700000000000L + day * 86400000L), 1L,
        "purchase", v, "{}")
    // revenue: day 0 = 100; days 1..40 alternate +1, except two crash days
    val vals = (0 to 40).map { d =>
      val base = 100.0 + d
      if (d == 10) base - 50 else if (d == 20) base - 30 else base
    }
    val df = vals.zipWithIndex.map { case (v, d) => ev(d, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Relational.revenueVar(df).collect().head
    assert(r.getAs[Long]("n_deltas") == 40L)
    // deltas: mostly +100 cents; day10 delta = -4900, day11 = +5200;
    // day20 = -2900, day21 = +3200. two smallest: -4900, -2900
    assert(r.getAs[Long]("var95") == -2900L)
    assert(r.getAs[Long]("n_tail_days") == 2L)
    assert(math.abs(r.getAs[Double]("cvar95") - (-3900.0)) < 1e-9)
    CacheTracker.drainAll(spark)
  }

  test("tokenHits: chain graph separates introducers from heads") {
    // "a b", "a c": a is the only hub (all out-edges), b/c pure authorities
    val d = docs(
      (1L, "aa bb", "en", "web"),
      (2L, "aa cc", "en", "web"),
      (3L, "aa bb", "en", "web"))
    val r = operators.Graph.tokenHits(d).collect()
      .map(x => x.getAs[String]("token") ->
        (x.getAs[Double]("hub"), x.getAs[Double]("authority"))).toMap
    assert(r("aa")._1 == 1.0) // sole hub, max-normalized to 1
    assert(r("aa")._2 == 0.0) // no in-edges
    assert(r("bb")._2 == 1.0) // strongest authority (w=2)
    assert(r("cc")._2 == 0.5) // half bb's weight
    assert(r("bb")._1 == 0.0 && r("cc")._1 == 0.0) // no out-edges
    CacheTracker.drainAll(spark)
  }

  test("poissonTrend: flat counts fit b1 ~ 0, geometric growth fits its rate") {
    import java.sql.Timestamp
    def events(counts: Seq[Int]): DataFrame =
      counts.zipWithIndex.flatMap { case (c, day) =>
        (0 until c).map(i => ((day * 1000 + i).toLong,
          new Timestamp(1700000000000L + day * 86400000L + i * 1000L),
          1L, "view", 1.0, "{}"))
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val flat = operators.Relational.poissonTrend(events(Seq.fill(20)(50)))
      .collect().head
    assert(math.abs(flat.getAs[Double]("b1")) < 1e-6)
    assert(math.abs(flat.getAs[Double]("b0") - math.log(50.0)) < 1e-6)
    // 5% daily growth: counts round(40 * 1.05^d)
    val grow = operators.Relational.poissonTrend(
      events((0 until 20).map(d => math.round(40 * math.pow(1.05, d)).toInt)))
      .collect().head
    assert(math.abs(grow.getAs[Double]("daily_growth") - 1.05) < 0.005,
      s"growth ${grow.getAs[Double]("daily_growth")}")
    CacheTracker.drainAll(spark)
  }

  test("huberTrend: outlier day barely moves the robust slope") {
    import java.sql.Timestamp
    def ev(day: Int, v: Double) =
      (day.toLong, new Timestamp(1700000000000L + day * 86400000L), 1L,
        "purchase", v, "{}")
    // clean rising trend +1/day with one massive spike at day 10
    val base = (0 until 30).map(d => ev(d, 100.0 + d))
    val spiked = base.updated(10, ev(10, 100000.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Relational.huberTrend(spiked).collect().head
    // true underlying slope: 100 cents/day (value*100); huber should be
    // near it while plain OLS would be pulled far off by the spike
    assert(math.abs(r.getAs[Double]("huber_slope") - 100.0) < 15.0,
      s"slope ${r.getAs[Double]("huber_slope")}")
    assert(r.getAs[Long]("n_days") == 30L)
    CacheTracker.drainAll(spark)
  }

  test("vocabCoverageEst: hand-checked chao1 and unseen mass") {
    // tokens: aa x3, bb x2, cc x1, dd x1 -> q0=4, N=7, f1=2, f2=1
    val d = docs((1L, "aa aa aa bb bb cc dd", "en", "s"))
    val r = operators.TextOps.vocabCoverageEst(d).collect().head
    assert(r.getAs[Long]("q0") == 4L)
    assert(r.getAs[Long]("n_tokens") == 7L)
    assert(r.getAs[Long]("f1") == 2L)
    assert(r.getAs[Long]("f2") == 1L)
    // chao1-bc = 4 + 2*1/(2*2) = 4.5
    assert(r.getAs[Double]("chao1") == 4.5)
    assert(math.abs(r.getAs[Double]("unseen_mass") - 2.0 / 7) < 1e-6)
    CacheTracker.drainAll(spark)
  }

  test("logrankTest: identical groups give chi2 ~ 0; checks E vs O bookkeeping") {
    assumeTestdata()
    val ev = SparkEntry.normalizeEventTs(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"))
    val r = operators.Relational.logrankTest(ev).collect().head
    val oa = r.getAs[Long]("o1").toDouble
    val e1 = r.getAs[Double]("e1")
    // bookkeeping invariants: E is a proper expectation, chi2
    // nonnegative (NULL when no churn variance exists at all), and the
    // parity groups partition the users
    assert(e1 >= 0.0)
    if (!r.isNullAt(r.fieldIndex("chi2"))) assert(r.getAs[Double]("chi2") >= 0.0)
    assert(r.getAs[Long]("n_users_a") + r.getAs[Long]("n_users_b") > 0)
    // parity split is arbitrary w.r.t. churn: O should be within a loose
    // band of E on this synthetic data
    assert(math.abs(oa - e1) < math.max(20.0, 0.5 * math.max(e1, 1.0)),
      s"o1 $oa vs e1 $e1")
    CacheTracker.drainAll(spark)
  }

  test("oddsRatio: hand-checked 2x2 and CI direction") {
    import java.sql.Timestamp
    def ev(id: Long, user: Long, typ: String) =
      (id, new Timestamp(1700000000000L + id * 1000), user, typ, 1.0, "{}")
    // group A (even users): 3 of 4 convert; group B (odd): 1 of 4
    val rows = (0L until 8L).map { u =>
      ev(u * 2, u, "view")
    } ++ Seq(0L, 2L, 4L, 1L).map(u => ev(100 + u, u, "purchase"))
    val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = operators.Relational.oddsRatio(df).collect().head
    // a=3 b=1 c=1 d=3 -> OR = 9
    assert(r.getAs[Long]("n_conv_a") == 3L)
    assert(r.getAs[Long]("n_noconv_a") == 1L)
    assert(r.getAs[Long]("n_conv_b") == 1L)
    assert(r.getAs[Long]("n_noconv_b") == 3L)
    assert(r.getAs[Double]("odds_ratio") == 9.0)
    assert(r.getAs[Double]("ci_lo") < 9.0 && r.getAs[Double]("ci_hi") > 9.0)
    CacheTracker.drainAll(spark)
  }

  test("sourceRuzicka: hand-checked min/max identity") {
    // s1: aa aa bb ; s2: aa bb bb cc -> shared min: aa 1, bb 1 => s_min 2
    // ruzicka = 2 / (3 + 4 - 2) = 0.4
    val d = docs(
      (1L, "aa aa bb", "en", "s1"),
      (2L, "aa bb bb cc", "en", "s2"))
    val r = operators.TextOps.sourceRuzicka(d).collect().head
    assert(r.getAs[Long]("s_min") == 2L)
    assert(r.getAs[Double]("ruzicka") == 0.4)
    // identical histograms -> 1.0
    val same = operators.TextOps.sourceRuzicka(docs(
      (1L, "aa bb cc", "en", "x"), (2L, "aa bb cc", "en", "y"))).collect().head
    assert(same.getAs[Double]("ruzicka") == 1.0)
  }

  test("cochranQ matches the textbook block formula on real docs") {
    assumeTestdata()
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = operators.TextOps.cochranQ(d).collect().head
    val flags = d.selectExpr(
      """CASE WHEN round(
          (CASE WHEN length(text) >= 20 THEN 1.0 ELSE length(text) / 20.0 END)
          * (1.0 - CASE WHEN length(text) > 0
              THEN size(regexp_extract_all(text, '[^a-zA-Z0-9\\s]', 0)) / CAST(length(text) AS DOUBLE)
              ELSE 0.0 END)
          * (CASE WHEN size(filter(split(text, '\\s+'), t -> t <> '')) > 0
              THEN least(1.0,
                size(filter(split(text, '\\s+'), t -> lower(t) IN ('the','a','an','and','or','of','to','in','is','it')))
                / CAST(size(filter(split(text, '\\s+'), t -> t <> '')) AS DOUBLE) * 5.0 + 0.5)
              ELSE 0.0 END), 6) >= 0.5 THEN 1 ELSE 0 END""",
      "CASE WHEN length(text) >= 100 THEN 1 ELSE 0 END",
      """CASE WHEN (CASE WHEN length(text) > 0
           THEN size(regexp_extract_all(text, '[a-zA-Z]', 0)) / CAST(length(text) AS DOUBLE)
           ELSE 0.0 END) >= 0.6 THEN 1 ELSE 0 END""")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2)))
    val k = 3.0
    val cj = Seq(flags.map(_._1).sum.toDouble, flags.map(_._2).sum.toDouble,
      flags.map(_._3).sum.toDouble)
    val t = cj.sum
    val sr2 = flags.map(f => { val r = f._1 + f._2 + f._3; (r * r).toDouble }).sum
    val want = k * (k - 1) * cj.map(c => (c - t / k) * (c - t / k)).sum / (k * t - sr2)
    assert(got.getAs[Long]("n_docs") == flags.length.toLong)
    assert(math.abs(got.getAs[Double]("q_stat") - want) < 1e-3,
      s"q ${got.getAs[Double]("q_stat")} want $want")
  }
}
