package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, LangModel, TextOps}

/** Round-9 additions: stride-1 duplicated-span detection, CCNet-style
  * perplexity buckets, and the vocabulary coverage curve. */
class Round9OpsSpec extends SparkSpec {
  import spark.implicits._

  // a 10-token passage planted in two docs at DIFFERENT offsets (0 vs 3):
  // the fixed 8-token chunk grid of paragraphDedup/lineFreqFilter slices
  // it differently in each doc, but stride-1 shingles align regardless
  private val passage = "alpha bravo charlie delta echo foxtrot golf hotel india juliett"
  private lazy val spanDocs = Seq(
    (1L, passage + " kilo lima mike november oscar papa"),
    (2L, "one two three " + passage + " quebec romeo sierra tango"),
    (3L, "unique words only here nothing shared with any other document present today"),
    (4L, "tiny doc"))
    .toDF("doc_id", "text")

  test("span_dedup catches a cross-doc passage at unaligned offsets") {
    val out = Dedup.spanDedup(spanDocs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the shared 10-token passage = 3 duplicated shingles covering 10 positions
    assert(out(1L).getAs[Long]("n_dup_tokens") === 10L)
    assert(out(2L).getAs[Long]("n_dup_tokens") === 10L)
    assert(out(1L).getAs[Double]("dup_token_frac") === math.round(10.0 / 16 * 1e6) / 1e6)
    // the fixed chunk grid misses this same duplication entirely
    val para = TextOps.paragraphDedup(spanDocs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_kept")).toMap
    val chunks = TextOps.paragraphDedup(spanDocs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_chunks")).toMap
    assert(para(1L) === chunks(1L) && para(2L) === chunks(2L),
      "stride-8 chunks should NOT detect the offset-3 copy (that is the point)")
  }

  test("span_dedup: unique and short docs report zero duplication") {
    val out = Dedup.spanDedup(spanDocs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(3L).getAs[Long]("n_dup_tokens") === 0L)
    assert(out(3L).getAs[Double]("dup_token_frac") === 0.0)
    // 2 tokens < win=8: zero shingles, zero dup, but the doc stays present
    assert(out(4L).getAs[Long]("n_shingles") === 0L)
    assert(out(4L).getAs[Double]("dup_token_frac") === 0.0)
  }

  test("span_dedup ignores WITHIN-doc repetition") {
    val rep = Seq((1L, passage + " " + passage)).toDF("doc_id", "text")
    val out = Dedup.spanDedup(rep).collect().head
    assert(out.getAs[Long]("n_dup_tokens") === 0L,
      "a passage repeated inside one doc is repetitionStats' business, not dedup's")
  }

  private lazy val bucketDocs = {
    // per-lang corpora with a quality gradient: doc i repeats a common
    // bigram i times then appends increasingly rare transitions
    val words = Seq("red", "blue", "green", "gold", "grey", "pink", "jade", "teal")
    (0 until 24).map { i =>
      val lang = if (i % 2 == 0) "en" else "fr"
      val common = Seq.fill(8)(s"$lang common base").mkString(" ")
      val rare = words.take(1 + i / 3).mkString(" ")
      (i.toLong, s"$common $rare", lang)
    }.toDF("doc_id", "text", "lang")
  }

  test("ccnet_buckets: every scored doc bucketed; buckets order by nll within lang") {
    val out = LangModel.ccnetBuckets(bucketDocs).collect()
    assert(out.length === 24)
    for (lang <- Seq("en", "fr")) {
      val rows = out.filter(_.getAs[String]("lang") == lang)
      val byBucket = rows.groupBy(_.getAs[String]("bucket"))
        .view.mapValues(_.map(_.getAs[Double]("nll"))).toMap
      assert(byBucket.keySet.subsetOf(Set("head", "middle", "tail")))
      assert(byBucket.contains("head") && byBucket.contains("tail"))
      // head (lowest NLL = most in-distribution) never exceeds tail
      assert(byBucket("head").max <= byBucket("tail").min)
      for (m <- byBucket.get("middle")) {
        assert(byBucket("head").max <= m.min && m.max <= byBucket("tail").min)
      }
      // quartile cut: head is roughly a quarter of the language
      assert(byBucket("head").length <= rows.length / 2)
    }
  }

  test("span_dedup_trim removes every copy of the shared passage, keeps the rest") {
    val out = Dedup.spanDedupTrim(spanDocs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // ALL occurrences go (ExactSubstr rule), unique remainders survive in order
    assert(out(1L).getAs[String]("trimmed_text") === "kilo lima mike november oscar papa")
    assert(out(1L).getAs[Long]("n_kept") === 6L)
    assert(out(2L).getAs[String]("trimmed_text") === "one two three quebec romeo sierra tango")
    assert(out(2L).getAs[Long]("n_kept") === 7L)
    // untouched and sub-window docs pass through whole
    assert(out(3L).getAs[Long]("n_kept") === out(3L).getAs[Long]("n_tokens"))
    assert(out(4L).getAs[String]("trimmed_text") === "tiny doc")
  }

  test("span_dedup_trim: a full clone pair trims BOTH copies to empty") {
    val docs = Seq((1L, passage), (2L, passage)).toDF("doc_id", "text")
    val out = Dedup.spanDedupTrim(docs).collect()
    assert(out.length === 2)
    for (r <- out) {
      assert(r.getAs[Long]("n_kept") === 0L)
      assert(r.getAs[String]("trimmed_text") === "")
    }
  }

  test("span_dedup invariants on a seeded random corpus with planted clones") {
    // deterministic LCG corpus: 40 base docs over a 12-word vocab, plus
    // full clones of 10 of them under fresh ids
    val vocab = Array("ara", "bel", "cor", "dun", "eli", "fen",
      "gor", "hul", "ive", "jun", "kel", "lor")
    var state = 12345L
    def nextInt(n: Int): Int = {
      state = state * 6364136223846793005L + 1442695040888963407L
      (math.abs(state >> 33) % n).toInt
    }
    val base = (0 until 40).map { id =>
      val len = 5 + nextInt(20)
      (id.toLong, Seq.fill(len)(vocab(nextInt(vocab.length))).mkString(" "))
    }
    val clones = base.take(10).map { case (id, text) => (id + 1000L, text) }
    val docs = (base ++ clones).toDF("doc_id", "text")
    val rows = Dedup.spanDedup(docs).collect()
    val byId = rows.map(r => r.getAs[Long]("doc_id") -> r).toMap
    // bounds hold everywhere
    for (r <- rows) {
      val frac = r.getAs[Double]("dup_token_frac")
      assert(frac >= 0.0 && frac <= 1.0)
      assert(r.getAs[Long]("n_dup_tokens") <= r.getAs[Long]("n_tokens"))
    }
    // a full clone pair is 100% duplicated on both sides (when long enough
    // to shingle)
    for ((id, _) <- base.take(10) if byId(id).getAs[Long]("n_tokens") >= 8) {
      assert(byId(id).getAs[Double]("dup_token_frac") === 1.0, s"doc $id")
      assert(byId(id + 1000L).getAs[Double]("dup_token_frac") === 1.0, s"clone of $id")
    }
    // partition-count independence: same rows at 1 and 7 partitions
    val p1 = Dedup.spanDedup(docs.repartition(1)).collect().sortBy(_.getAs[Long]("doc_id"))
    val p7 = Dedup.spanDedup(docs.repartition(7)).collect().sortBy(_.getAs[Long]("doc_id"))
    assert(p1.map(_.toString).toSeq === p7.map(_.toString).toSeq)
  }

  test("scd2_intervals collapses consecutive runs into validity intervals") {
    val ev = Seq(
      (1L, 1L, "view", "2024-01-01 00:00:00"),
      (2L, 1L, "view", "2024-01-01 00:05:00"),
      (3L, 1L, "cart", "2024-01-01 00:10:00"),
      (4L, 1L, "view", "2024-01-01 00:20:00"),
      (5L, 2L, "buy", "2024-01-01 01:00:00"))
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", to_timestamp(col("s"))).drop("s")
    val out = graft.operators.Sessionize.scd2Intervals(ev)
      .orderBy("user_id", "run_id").collect()
    assert(out.length === 4)
    val u1 = out.filter(_.getAs[Long]("user_id") == 1L)
    // view(2 events) -> cart(1) -> view(1): the same type reopens a NEW run
    assert(u1.map(_.getAs[String]("event_type")).toSeq === Seq("view", "cart", "view"))
    assert(u1.map(_.getAs[Long]("n_events")).toSeq === Seq(2L, 1L, 1L))
    // intervals tile the timeline: each run's valid_to is the next's valid_from
    assert(u1(0).getAs[Long]("valid_to_us") === u1(1).getAs[Long]("valid_from_us"))
    assert(u1(1).getAs[Long]("valid_to_us") === u1(2).getAs[Long]("valid_from_us"))
    assert(u1.map(_.getAs[Boolean]("is_current")).toSeq === Seq(false, false, true))
    val u2 = out.filter(_.getAs[Long]("user_id") == 2L)
    assert(u2.length === 1 && u2.head.getAs[Boolean]("is_current"))
  }

  test("token_coverage_curve: ranks by frequency, cum_frac climbs to 1") {
    val docs = Seq(
      (1L, "apple apple apple apple banana banana cherry"),
      (2L, "apple apple banana date")).toDF("doc_id", "text")
    val out = TextOps.tokenCoverageCurve(docs)
      .orderBy("vocab_rank").collect()
    assert(out.map(_.getAs[String]("token")).take(2).toSeq === Seq("apple", "banana"))
    val fracs = out.map(_.getAs[Double]("cum_frac"))
    assert(fracs.zip(fracs.tail).forall { case (a, b) => a <= b }, "monotone")
    assert(fracs.last === 1.0)
    val cnts = out.map(_.getAs[Long]("cnt"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b }, "cnt nonincreasing")
    // 6 apples of 11 tokens
    assert(fracs.head === math.round(6.0 / 11 * 1e6) / 1e6)
  }
}
