package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-15 additions: the eviction-proof reworks (distinct_ngrams'
  * single-stream agg, detector_agreement's one-job census), the IVF
  * nProbe sweep, the data-scaling curve, the bootstrap_ci pre-sample
  * cap, and the sketch-store SQL surfaces. */
class Round15Spec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, String, String)*): DataFrame =
    rows.map { case (id, lang, source, text) =>
      (id, text, lang, source, text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  // ------------------------------------------------------ distinct_ngrams

  test("distinctNgrams: single-stream agg matches hand counts incl. bigram-free sources") {
    val d = docs(
      (1L, "en", "web", "a b a b"),     // uni: 4 toks 2 distinct; bi: a b, b a, a b -> 3 toks 2 distinct
      (2L, "en", "web", "c"),           // uni only
      (3L, "en", "solo", "x"),          // a source with NO bigrams anywhere
      (4L, "en", "solo", "y"))
    val r = operators.TextOps.distinctNgrams(d)
      .collect().map(x => x.getString(0) -> x).toMap
    val web = r("web")
    assert(web.getLong(1) == 5L && web.getLong(2) == 3L)          // n_unigrams, distinct
    assert(web.getLong(4) == 3L && web.getLong(5) == 2L)          // n_bigrams, distinct
    assert(web.getDouble(6) == math.round(2.0 / 3.0 * 1e6) / 1e6) // distinct_2
    val solo = r("solo")
    assert(solo.getLong(4) == 0L && solo.getLong(5) == 0L && solo.getDouble(6) == 0.0)
  }

  test("distinctNgrams: empty-token docs drop out instead of erroring") {
    val d = docs((1L, "en", "w", ""), (2L, "en", "w", "a"))
    val r = operators.TextOps.distinctNgrams(d).collect()
    assert(r.length == 1 && r.head.getLong(1) == 1L && r.head.getLong(4) == 0L)
  }

  // -------------------------------------------------- detector_agreement

  test("detectorAgreement: one-row census with n_both <= min(detectors), jaccard in [0,1]") {
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val d = docs(
      (1L, "en", "w", base), (2L, "en", "w", base),                 // exact dup pair
      (3L, "en", "w", base + " extra"),                             // near dup
      (4L, "en", "w", "completely different text about query engines"))
    val r = operators.Dedup.detectorAgreement(d).head()
    val (nm, ns, nb) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nb <= math.min(nm, ns))
    val j = r.getDouble(3)
    assert(j >= 0.0 && j <= 1.0)
    assert(nm >= 1L && ns >= 1L, "the exact-dup pair must be caught by both detectors")
  }

  // ---------------------------------------------------- ann_nprobe_sweep

  test("annNprobeSweep: recall is non-decreasing in probe width and hits its brute-force cap") {
    val emb = (0L until 40L).map { i =>
      (i, Array.tabulate(16)(d => ((i * 7 + d * 3) % 13 - 6).toFloat / 6f), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val rows = operators.Similarity.annNprobeSweep(emb, maxQueryId = 6, k = 3,
        nCells = 4, probes = Seq(1, 2, 4))
      .orderBy("n_probe").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 4L))
    val recalls = rows.map(_.getDouble(3))
    assert(recalls.sliding(2).forall(p => p(0) <= p(1)),
      s"recall must not drop as probes widen: ${recalls.mkString(",")}")
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1) * 3),
      "hits can never exceed n_queries * k")
    // probing EVERY cell is exhaustive search over the same candidates
    assert(recalls.last == 1.0,
      s"nProbe = nCells must recover brute force exactly, got ${recalls.last}")
  }

  // ------------------------------------------------------- scaling_curve

  test("scalingCurve: nested prefixes grow and more data never hurts the unigram fit") {
    val d = docs((0L until 64L).map { i =>
      (i, "en", "w", s"tok${i % 7} tok${i % 3} tok${i % 5} filler common words")
    }: _*)
    val rows = operators.LangModel.scalingCurve(d)
      .orderBy("prefix_sixteenths").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L, 4L, 8L))
    val nTrain = rows.map(_.getLong(1))
    assert(nTrain(0) < nTrain(1) && nTrain(1) < nTrain(2),
      "nested prefixes must strictly grow on a dense corpus")
    val xent = rows.map(_.getDouble(2))
    assert(xent.forall(_ > 0.0))
    // identical slope/intercept columns on every row (one shared fit)
    assert(rows.map(_.getDouble(3)).distinct.length == 1)
    assert(rows.map(_.getDouble(4)).distinct.length == 1)
  }

  // -------------------------------------------------- bootstrap_ci cap

  test("bootstrapCi: the pre-sample cap is a no-op below the cap") {
    val d = docs((0L until 30L).map(i =>
      (i, if (i % 2 == 0) "en" else "fr", "w", "x" * (10 + (i % 7)).toInt)): _*)
    val capped = operators.Eval.bootstrapCi(d, reps = 50, maxN = 100000)
      .orderBy("lang").collect().map(_.toSeq)
    val tiny = operators.Eval.bootstrapCi(d, reps = 50, maxN = Int.MaxValue)
      .orderBy("lang").collect().map(_.toSeq)
    assert(capped.toSeq == tiny.toSeq)
  }

  test("bootstrapCi: past the cap the draw frame is bounded but the point estimate stays exact") {
    val d = docs((0L until 40L).map(i =>
      (i, "en", "w", "y" * (5 + (i % 11)).toInt)): _*)
    val r = operators.Eval.bootstrapCi(d, reps = 20, maxN = 8).head()
    // point estimate over the FULL 40 docs, not the 8-doc pre-sample
    assert(r.getLong(1) == 40L)
    val mean = d.agg(avg(col("n_chars"))).head().getDouble(0)
    assert(math.abs(r.getDouble(2) - mean) < 1e-6)
    // the CI bounds come from the 8-doc resample and must still bracket
    assert(r.getDouble(3) <= r.getDouble(4))
  }

  // --------------------------------------------- allocation + pair mining

  test("neymanAllocation: quotas sum to the budget and diverse strata outweigh uniform ones") {
    val d = docs(((0L until 60L).map { i =>
      // en: high variance (lengths spread), fr: uniform short
      if (i % 2 == 0) (i, "en", "w", "x" * (10 + (i.toInt % 30) * 7))
      else (i, "fr", "w", "y" * 12)
    }): _*)
    val r = operators.Eval.neymanAllocation(d, budget = 20)
      .orderBy("lang").collect()
    assert(r.map(_.getLong(4)).sum == 20L, "largest-remainder quotas must sum to budget")
    val byLang = r.map(x => x.getString(0) -> x).toMap
    assert(byLang("en").getLong(4) > byLang("fr").getLong(4),
      "the high-variance stratum must receive the larger quota")
    assert(byLang("fr").getDouble(2) == 0.0, "uniform stratum has zero sd")
    r.foreach(x => assert(x.getLong(5) <= x.getLong(1), "cannot draw more than N_h"))
  }

  test("marginPairs: one best match per left vector, margins above the floor") {
    val emb = (0L until 30L).map { i =>
      (i, Array.tabulate(16)(dd => (((i % 5) + 1) * (dd + 1) % 7 - 3).toFloat / 3f), i % 2)
    }.toDF("vec_id", "embedding", "label")
    val r = operators.Similarity.marginPairs(emb).collect()
    assert(r.nonEmpty)
    val lefts = r.map(_.getLong(0))
    assert(lefts.distinct.length == lefts.length, "one row per left vector")
    r.foreach(x => assert(x.getDouble(3) >= 1.02, s"margin below floor: $x"))
  }

  // ------------------------------------------- SQL-defined function twins

  test("qualityScoreSqlUdf equals the Column-expression twin row for row") {
    val d = docs(
      (1L, "en", "w", "the quick brown fox, and a lazy dog of it!"),
      (2L, "en", "w", "short"),
      (3L, "en", "w", ""),
      (4L, "en", "w", "!!! ??? ,,, ..."))
    val a = operators.TextOps.qualityScore(d).orderBy("doc_id").collect().map(_.toSeq)
    val b = operators.TextOps.qualityScoreSqlUdf(d).orderBy("doc_id").collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq)
  }

  test("shingleTvf: LATERAL table function emits exactly the w-gram census") {
    val d = docs(
      (1L, "en", "w", "a b c d"),   // 2 trigram positions, both distinct
      (2L, "en", "w", "x x x x x"), // 3 positions, ONE distinct gram
      (3L, "en", "w", "too short"))
    val r = operators.TextOps.shingleTvf(d).orderBy("doc_id").collect()
    assert(r.map(_.getLong(0)).toSeq == Seq(1L, 2L), "short docs emit nothing")
    assert(r(0).getLong(1) == 2L && r(0).getLong(2) == 2L)
    assert(r(1).getLong(1) == 3L && r(1).getLong(2) == 1L)
  }

  test("tokenBfsRcte: the engine-driven recursion equals the unrolled BFS") {
    val d = docs((0L until 40L).map { i =>
      (i, "en", "w", s"hub tok${i % 6} tok${(i + 1) % 6} leaf${i % 9}")
    }: _*)
    val unrolled = operators.Graph.tokenBfs(d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    val rcte = operators.Graph.tokenBfsRcte(d).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(rcte == unrolled)
  }

  // ---------------------------------------------------- head_tail_overlap

  test("headTailOverlap: detects the splice boundary and nothing else") {
    val shared = "one two three four five six seven eight"
    val d = docs(
      (1L, "en", "w", s"first half of the source document ends with $shared"),
      (2L, "en", "w", s"$shared and then the second half continues onward here"),
      (3L, "en", "w", "a completely unrelated document with plenty of tokens inside"),
      (4L, "en", "w", "short"))
    val pairs = operators.Dedup.headTailOverlap(d) // production win = 8
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)),
      s"doc 1's tail is doc 2's head, nothing else should pair: $pairs")
  }

  // ------------------------------------------------ windowed HLL family

  test("hllWindowDistinct: window merge equals one sketch over the union, exact count exact") {
    val events = (0L until 200L).map { i =>
      (i, i % 37, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z")
          .plusSeconds((i % 10) * 86400 + i)), "click", 1.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = operators.Sketches.hllWindowDistinct(events)
      .orderBy("win_day").collect()
    assert(r.length == 10)
    // day 9's trailing-7 window covers days 3..9: users are i%37 over a
    // contiguous id stretch -> the exact count is computable by hand
    val exactLast = (0L until 200L)
      .filter(i => (i % 10) >= 3).map(_ % 37).distinct.size
    assert(r.last.getLong(1) == exactLast)
    // the p=8 estimate at ~37 uniques rides linear counting: tight
    r.foreach(row =>
      assert(math.abs(row.getDouble(4)) < 0.15,
        s"rel_err too large: $row"))
  }

  test("hllNewUsers: inclusion-exclusion baseline day is skipped, exact anti-join is right") {
    val events = (0L until 60L).map { i =>
      // day 0: users 0..9; day 1: users 5..14 (5 new); day 2: users 0..4 (0 new)
      val day = i / 20
      val u = day match {
        case 0 => i % 10
        case 1 => 5 + (i % 10)
        case _ => i % 5
      }
      (i, u, java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z")
          .plusSeconds(day * 86400 + i)), "click", 1.0)
    }.toDF("event_id", "user_id", "ts", "event_type", "value")
    val r = operators.Sketches.hllNewUsers(events)
      .orderBy("day").collect()
    // day 0 has no prior window -> dropped; days 1 and 2 report
    assert(r.length == 2)
    assert(r(0).getLong(1) == 5L, s"day 1 should have 5 new users: ${r(0)}")
    assert(r(1).getLong(1) == 0L, s"day 2 should have 0 new users: ${r(1)}")
    assert(r(1).isNullAt(5), "rel_err must be NULL when n_true_new = 0")
  }

  // ------------------------------------------------ sketch store tables

  test("sketchCmsTable: merged store readback equals the from-scratch batch sketch") {
    val d = docs((0L until 24L).map(i =>
      (i, "en", "w", s"alpha beta tok${i % 5} gamma")): _*)
    val viaStore = streaming.Events.sketchCmsTable(d)
      .orderBy("r", "bucket").collect().map(_.toSeq)
    val cnt = d.select(explode(operators.TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("true_cnt"))
    val direct = operators.Sketches.cmsCellsFromCounts(cnt, 4, 256)
      .select(col("r").cast("long").as("r"), col("bucket"), col("cell"))
      .orderBy("r", "bucket").collect().map(_.toSeq)
    assert(viaStore.toSeq == direct.toSeq)
  }

  test("sketchHllTable / sketchBloomTable: merge algebras reproduce the batch build") {
    val d = docs((0L until 24L).map(i =>
      (i, "en", "w", s"alpha beta tok${i % 6} gamma")): _*)
    val hll = streaming.Events.sketchHllTable(d)
      .orderBy("reg").collect().map(_.toSeq)
    val hllDirect = operators.Sketches.hllRegisters(d)
      .orderBy("reg").collect().map(_.toSeq)
    assert(hll.toSeq == hllDirect.toSeq)
    val bloom = streaming.Events.sketchBloomTable(d)
      .orderBy("pos").collect().map(_.getLong(0))
    val bloomDirect = operators.Sketches.bloomPositions(
        d.select(explode(operators.TextOps.tokens(col("text"))).as("token")).distinct(),
        4, 4096)
      .select("pos").distinct().orderBy("pos").collect().map(_.getLong(0))
    assert(bloom.toSeq == bloomDirect.toSeq)
  }
}
