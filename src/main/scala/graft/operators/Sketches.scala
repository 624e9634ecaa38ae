package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic streaming-sketch family (C198-C200): Count-Min, Bloom,
  * and HyperLogLog with md5-derived hash rows instead of seeded PRNG
  * hashes — the THE 100 TB cardinality/frequency tools, here in a form a
  * DuckDB oracle reproduces bit-for-bit. Spark's own sketch aggregates
  * (approx_count_distinct, bloom_filter_agg) stay seed-bound; these rows
  * prove the sketch MATH and its distributed shape (mergeable per-row
  * partials, vocab-bounded cell frames) with hash-exact checks.
  */
object Sketches {

  /** First 8 md5 hex chars of `s` as a non-negative 32-bit value. */
  private def h32(s: org.apache.spark.sql.Column) =
    conv(substring(md5(s), 1, 8), 16, 10).cast("long")

  /** Count-Min sketch error census (C198): a depth×width CMS over the
    * corpus token stream, read back against the exact counts for the
    * top-`k` tokens — the "how wrong is the sketch where it matters"
    * readout that sizes width/depth before anyone trusts CMS at scale.
    * est(t) = min over rows r of cell(r, md5(r:t) mod width); CMS never
    * underestimates, so `over` = est − true ≥ 0 always.
    *
    * Scale shape: the only corpus-sized pass is the token count; cells
    * aggregate the vocab-bounded (token, cnt) frame exploded `depth`
    * ways (map-side partial sums — exactly the mergeability CMS is for);
    * the read-back joins the depth·k probe rows against the
    * width·depth-bounded cell frame. */
  def countMinErr(docs: DataFrame, depth: Int = 4, width: Int = 256,
                  k: Int = 20): DataFrame = {
    val cnt = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("true_cnt"))
    val top = cnt.orderBy(col("true_cnt").desc, col("token")).limit(k)
    cmsEstimate(cmsCellsFromCounts(cnt, depth, width), top, depth, width)
  }

  /** The CMS cell frame off a (token, true_cnt) count frame — the
    * associative partial the streaming incremental twin stores per
    * micro-batch and merges by plain summation (shared here so the batch
    * and streaming paths cannot drift). */
  def cmsCellsFromCounts(cnt: DataFrame, depth: Int, width: Int): DataFrame =
    cnt
      .select(col("token"), col("true_cnt"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .withColumn("bucket", h32(concat_ws(":", col("r"), col("token"))) % width)
      .groupBy("r", "bucket").agg(sum(col("true_cnt")).as("cell"))

  /** Read back the sketch for a (token, true_cnt) probe frame:
    * est(t) = min over rows of the probed cell. */
  def cmsEstimate(cells: DataFrame, probes: DataFrame,
                  depth: Int, width: Int): DataFrame =
    probes
      .select(col("token"), col("true_cnt"),
        explode(expr(s"sequence(0, ${depth - 1})")).as("r"))
      .withColumn("bucket", h32(concat_ws(":", col("r"), col("token"))) % width)
      .join(cells, Seq("r", "bucket"))
      .groupBy("token", "true_cnt").agg(min(col("cell")).as("est_cnt"))
      .select(col("token"), col("true_cnt"), col("est_cnt"),
        (col("est_cnt") - col("true_cnt")).as("overcount"))

  /** Bloom-filter false-positive audit (C199): a k-hash/m-bit Bloom set
    * over the corpus vocabulary, probed with a guaranteed-disjoint query
    * set (each member token + "_q" — the cleaned alphabet has no
    * underscore, so no probe is a member), measured FPR against the
    * textbook (1 − e^(−k·n/m))^k. The go/no-go check before shipping a
    * Bloom pre-filter into a 100 TB anti-join.
    *
    * The bit array is an honest distributed set (distinct positions
    * frame), members and probes stream through the same md5 positions;
    * a probe false-positives iff all k of its positions are set. */
  /** The k md5 bit positions per member token — shared with the
    * streaming incremental twin so the two filters cannot drift. */
  def bloomPositions(tokens: DataFrame, kHashes: Int, mBits: Int): DataFrame =
    tokens
      .select(col("token"), explode(expr(s"sequence(0, ${kHashes - 1})")).as("i"))
      .withColumn("pos", h32(concat_ws(":", col("i"), col("token"))) % mBits)

  def bloomFpr(docs: DataFrame, kHashes: Int = 4, mBits: Int = 4096): DataFrame = {
    val members = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
      .distinct()
    def positions(df: DataFrame) = bloomPositions(df, kHashes, mBits)
    val bits = positions(members).select("pos").distinct()
    val probeHits = positions(members.select(concat(col("token"), lit("_q")).as("token")))
      .join(bits, Seq("pos"), "left_semi")
      .groupBy("token").agg(count(lit(1)).as("hits"))
      .filter(col("hits") === kHashes)
      .agg(count(lit(1)).as("n_fp"))
    val nm = members.agg(count(lit(1)).as("n_members"))
    val nb = bits.agg(count(lit(1)).as("n_bits_set"))
    nm.crossJoin(broadcast(nb)).crossJoin(broadcast(probeHits))
      .select(col("n_members"), col("n_bits_set"),
        col("n_members").as("n_probes"), col("n_fp"),
        round(col("n_fp").cast("double") / col("n_members"), 6).as("fpr"),
        round(pow(lit(1.0) - exp(lit(-kHashes.toDouble) * col("n_members") / mBits),
          kHashes.toDouble), 6).as("theory_fpr"))
  }

  /** Deterministic HyperLogLog (C200): the p=8 (256-register) HLL over
    * the corpus vocabulary with md5 as the hash — register = top 8 bits
    * of the 32-bit hash, rho = leading-zero rank of the remaining 24
    * bits — checked against the EXACT distinct count. Spark's
    * approx_count_distinct is this sketch with an engine seed; this row
    * proves the estimator math (raw harmonic-mean estimate + the
    * small-range linear-counting branch) hash-exactly.
    *
    * Every 2^(−rho) term is a power of two and the 256-term sum spans
    * < 53 bits of mantissa, so Z is EXACT in double regardless of
    * aggregation order — no fold-order seam. The register frame is
    * 256-bounded; the only corpus-sized pass is the distinct. */
  def hllDet(docs: DataFrame): DataFrame = {
    val m = 256
    val regs = hllRegisters(docs)
    val nTrue = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
      .agg(countDistinct(col("token")).as("n_true"))
    val est = hllEstimate(regs).crossJoin(broadcast(nTrue))
    est.select(col("n_true"), col("n_used").as("n_registers_used"),
      round(col("estimate"), 6).as("estimate"),
      // rel_err derives from the ROUNDED estimate so both engines
      // compare post-round values, never raw last-bit doubles
      round((round(col("estimate"), 6) - col("n_true")) / col("n_true"), 6)
        .as("rel_err"))
  }

  /** The (reg, mx) register frame off a docs corpus — the associative
    * partial the streaming incremental twin stores per micro-batch and
    * merges by per-register MAX (shared so batch and streaming paths
    * cannot drift). */
  def hllRegisters(docs: DataFrame): DataFrame = {
    val h = docs.select(explode(TextOps.tokens(col("text"))).as("token"))
      .distinct()
      .select(h32(col("token")).as("h"))
      .select(expr("h div 16777216").as("reg"), (col("h") % 16777216L).as("w"))
      // rho = leading zeros in the 24-bit word + 1; bin() has no leading
      // zeros in either engine, so rho = 25 - len(bin(w)), w=0 -> 25
      .select(col("reg"),
        when(col("w") === 0L, lit(25L))
          .otherwise(lit(25L) - length(bin(col("w")))).as("rho"))
    h.groupBy("reg").agg(max(col("rho")).as("mx"))
  }

  /** One-row (n_used, estimate) readout off a register frame: the raw
    * harmonic-mean estimate with the small-range linear-counting branch. */
  def hllEstimate(regs: DataFrame): DataFrame = {
    val m = 256
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    regs.agg(
        count(lit(1)).as("n_used"),
        sum(pow(lit(2.0), -col("mx"))).as("z_used"))
      .withColumn("z", col("z_used") + (lit(m.toLong) - col("n_used")).cast("double"))
      .withColumn("e_raw", lit(alpha * m * m) / col("z"))
      .withColumn("v", lit(m.toLong) - col("n_used"))
      .withColumn("estimate",
        when(col("e_raw") <= 2.5 * m && col("v") > 0L,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("e_raw")))
      .select(col("n_used"), col("estimate"))
  }

  /** Sliding-window distinct users via mergeable HLL registers (C216):
    * per-day (reg, mx) partials off md5(user_id) merged by register MAX
    * across each trailing `window`-day span, estimated with the same
    * p=8 raw-harmonic + linear-counting math as [[hllDet]], and checked
    * against the exact windowed distinct — the 100 TB shape for rolling
    * uniques. The point at scale: daily partials are ≤256 rows each, a
    * window merges by MAX over ≤256·window rows instead of re-scanning
    * `window` days of raw events, the SAME partials serve any window
    * length, and a late day re-materializes only its own partial. The
    * exact comparator (user×window explode + countDistinct, a
    * window-fold of the raw stream) is the cost this replaces.
    *
    * Determinism: rho terms are md5-derived integers; each 2^(−rho)
    * addend is a power of two and a window's ≤256-term Z spans < 53
    * mantissa bits, so the sum is EXACT in double at any fold order —
    * no seed, no aggregation seam. Windows are trailing: day d's
    * partial feeds windows ending at d..d+window−1, gated to days that
    * exist in the data. */
  def hllWindowDistinct(events: DataFrame, window: Int = 7): DataFrame = {
    val du = events.select(
        expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .distinct()
    val days = du.select("day").distinct()
    val est = windowEstimate(dailyUserRegisters(events), days, window)
    val exact = du
      .withColumn("win_day",
        explode(sequence(col("day"), col("day") + (window - 1))))
      .join(days.select(col("day").as("win_day")), Seq("win_day"), "left_semi")
      .groupBy("win_day")
      .agg(countDistinct(col("user_id")).as("n_true"))
    est.join(exact, "win_day")
      .select(col("win_day"), col("n_true"),
        col("n_used").as("n_registers_used"),
        round(col("estimate"), 6).as("estimate"),
        round((round(col("estimate"), 6) - col("n_true")) / col("n_true"), 6)
          .as("rel_err"))
  }

  /** The per-day (day, reg, mx) user-register partials — the associative
    * frame the streaming incremental windowed-HLL store persists per
    * micro-batch and merges by per-(day, reg) MAX (shared so batch and
    * streaming cannot drift). */
  private[graft] def dailyUserRegisters(events: DataFrame): DataFrame =
    events.select(
        expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .distinct()
      .select(col("day"), h32(col("user_id").cast("string")).as("h"))
      .select(col("day"), expr("h div 16777216").as("reg"), (col("h") % 16777216L).as("w"))
      .select(col("day"), col("reg"),
        when(col("w") === 0L, lit(25L))
          .otherwise(lit(25L) - length(bin(col("w")))).as("rho"))
      .groupBy("day", "reg").agg(max(col("rho")).as("mx"))

  /** EXACT sliding-window distinct users via mergeable BITMAP word
    * partials (C238) — the exact counterpart of [[hllWindowDistinct]]:
    * user u sets bit (u mod 32) of word (u div 32); per-(day, word)
    * partials fold with BIT_OR (idempotent + associative, so map-side
    * combine collapses the raw event stream and duplicate events are
    * free); a trailing `window`-day merge is BIT_OR over each word's ≤
    * `window` partials; the count is Σ bit_count(word). Same partials
    * serve any window length; a late day re-materializes only its own
    * words. vs HLL: exact instead of ±2% at the cost of
    * |user-id-space|/32 words/day — the right trade whenever ids are
    * dense (roaring-bitmap territory). `n_true` (the raw
    * user×window-explode countDistinct this replaces) rides along so the
    * row is self-auditing: n_distinct must EQUAL it. */
  def bitmapWindowDistinct(events: DataFrame, window: Int = 7): DataFrame = {
    val words = events.select(
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("user_id div 32").as("word"),
        // expr, not functions.shiftleft: the Scala API only takes a
        // literal shift; the SQL expression form shifts by a column
        expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 32 AS INT))").as("bit"))
    val days = words.select("day").distinct()
    val daily = words.groupBy("day", "word").agg(expr("bit_or(bit)").as("bits"))
    val merged = daily
      .withColumn("win_day",
        explode(sequence(col("day"), col("day") + (window - 1))))
      .join(days.select(col("day").as("win_day")), Seq("win_day"), "left_semi")
      .groupBy("win_day", "word").agg(expr("bit_or(bits)").as("bits"))
      .groupBy("win_day")
      .agg(sum(bit_count(col("bits")).cast("long")).as("n_distinct"),
        count(lit(1)).as("n_words"))
    val exact = events.select(
        expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .distinct()
      .withColumn("win_day",
        explode(sequence(col("day"), col("day") + (window - 1))))
      .join(days.select(col("day").as("win_day")), Seq("win_day"), "left_semi")
      .groupBy("win_day")
      .agg(countDistinct(col("user_id")).as("n_true"))
    merged.join(exact, "win_day")
      .select(col("win_day"), col("n_distinct"), col("n_true"), col("n_words"))
  }

  /** EXACT audience-overlap matrix via bitmap word algebra (C240): the
    * same numbers as the set-join [[graft.operators.Relational.userOverlapJaccard]]
    * (C122) computed WITHOUT ever forming a per-user pair row — user u
    * sets bit pmod(u, 32) of word u >> 5 (floor semantics, so negative
    * ids map to distinct bits too), per-(type, word) partials
    * fold with BIT_OR (idempotent: duplicate events are free at the
    * map side), marginals are Σ bit_count(word), and every pairwise
    * intersection is Σ bit_count(a AND b) over the word-aligned join.
    * The roaring-bitmap pattern for dense id spaces: corpus involvement
    * ends at ONE (type, word) partial agg; the pair space is
    * |id-space|/32 words × C(types, 2) — independent of event count,
    * where C122's self-join carries one row per (user, pair). Same
    * output schema as C122 so the two are interchangeable (and the
    * oracle is the set-semantics SQL — the bitmap algebra must
    * reproduce it bit-exactly). */
  def bitmapOverlapMatrix(events: DataFrame): DataFrame = {
    // floor-div (shiftright) + pmod, NOT div/%: those truncate toward
    // zero, so negative user_ids -31..31 would collide into word 0 with
    // wrong bits and silently diverge from the set-semantics oracle.
    val words = events.select(col("event_type"),
        expr("shiftright(CAST(user_id AS BIGINT), 5)").as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(user_id, 32) AS INT))").as("bit"))
      .groupBy("event_type", "word").agg(expr("bit_or(bit)").as("bits"))
    val sizes = words.groupBy("event_type")
      .agg(sum(bit_count(col("bits")).cast("long")).as("n_users"))
    words.select(col("event_type").as("type_a"), col("word"), col("bits").as("ba"))
      .join(words.select(col("event_type").as("type_b"), col("word"),
        col("bits").as("bb")), "word")
      .filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b")
      .agg(sum(bit_count(col("ba").bitwiseAND(col("bb"))).cast("long")).as("n_both"))
      .filter(col("n_both") > 0)
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n_users").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n_users").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
        round(col("n_both").cast("double")
          / (col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"))
  }

  /** The rolling-window estimate off a (day, reg, mx) partial frame:
    * trailing `window`-day register MAX merge gated to `days`, then the
    * p=8 estimator (shared by the batch query and the streaming store's
    * published report). */
  private[graft] def windowEstimate(daily: DataFrame, days: DataFrame,
                                    window: Int): DataFrame = {
    val m = 256
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    daily
      .withColumn("win_day",
        explode(sequence(col("day"), col("day") + (window - 1))))
      .join(days.select(col("day").as("win_day")), Seq("win_day"), "left_semi")
      .groupBy("win_day", "reg").agg(max(col("mx")).as("mx"))
      .groupBy("win_day")
      .agg(count(lit(1)).as("n_used"),
        sum(pow(lit(2.0), -col("mx"))).as("z_used"))
      .withColumn("e_raw",
        lit(alpha * m * m)
          / (col("z_used") + (lit(m.toLong) - col("n_used")).cast("double")))
      .withColumn("v", lit(m.toLong) - col("n_used"))
      .withColumn("estimate",
        when(col("e_raw") <= 2.5 * m && col("v") > 0L,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("e_raw")))
  }

  /** New-user estimation by HLL inclusion-exclusion (C217): per day d,
    * estimated new users = est(prior 7 days ∪ day d) − est(prior 7
    * days), both estimates off register-MAX merges of the SAME per-day
    * partials [[hllWindowDistinct]] builds — the sketch-algebra answer
    * to "how many of today's users are actually new" that never
    * re-touches raw history (HLL supports union natively; the
    * difference comes from two union estimates, the standard retention
    * trick). Checked against the exact anti-join count. Days with no
    * prior day in range are skipped (no baseline to subtract).
    *
    * Same determinism as the window sketch: md5 registers, power-of-two
    * Z sums exact at any fold order, one rounding at the published
    * columns. The estimate CAN be noisy or negative at small deltas —
    * that is the honest sketch trade the rel_err column quantifies. */
  def hllNewUsers(events: DataFrame, window: Int = 7): DataFrame = {
    val m = 256
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val du = events.select(
        expr("unix_micros(ts) div 86400000000").as("day"), col("user_id"))
      .distinct()
    val days = du.select("day").distinct()
    val daily = du
      .select(col("day"), h32(col("user_id").cast("string")).as("h"))
      .select(col("day"), expr("h div 16777216").as("reg"), (col("h") % 16777216L).as("w"))
      .select(col("day"), col("reg"),
        when(col("w") === 0L, lit(25L))
          .otherwise(lit(25L) - length(bin(col("w")))).as("rho"))
      .groupBy("day", "reg").agg(max(col("rho")).as("mx"))
    // day e's partial reaches anchors d where e ∈ [d−window, d−lo]
    def anchored(df: DataFrame, lo: Int): DataFrame = df
      .withColumn("anchor",
        explode(sequence(col("day") + lo, col("day") + window)))
      .join(days.select(col("day").as("anchor")), Seq("anchor"), "left_semi")
    def estOf(regs: DataFrame, name: String): DataFrame = regs
      .groupBy("anchor", "reg").agg(max(col("mx")).as("mx"))
      .groupBy("anchor")
      .agg(count(lit(1)).as("n_used"),
        sum(pow(lit(2.0), -col("mx"))).as("z_used"))
      .withColumn("e_raw",
        lit(alpha * m * m)
          / (col("z_used") + (lit(m.toLong) - col("n_used")).cast("double")))
      .withColumn("v", lit(m.toLong) - col("n_used"))
      .select(col("anchor"),
        when(col("e_raw") <= 2.5 * m && col("v") > 0L,
          lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(col("e_raw")).as(name))
    val estPrior = estOf(anchored(daily, 1), "est_prior")
    val estBoth = estOf(anchored(daily, 0), "est_both")
    // exact: today's users never seen in the prior window
    val priorUsers = anchored(du, 1).select(col("anchor"), col("user_id"))
    val exact = du.select(col("day").as("anchor"), col("user_id"))
      .join(priorUsers, Seq("anchor", "user_id"), "left_anti")
      .groupBy("anchor").agg(count(lit(1)).as("n_true_new"))
    // inner join on est_prior: the first day has no baseline to subtract
    estBoth.join(estPrior, "anchor")
      .join(exact, Seq("anchor"), "left")
      .select(col("anchor").as("day"),
        coalesce(col("n_true_new"), lit(0L)).as("n_true_new"),
        round(col("est_prior"), 6).as("est_prior"),
        round(col("est_both"), 6).as("est_both"),
        round(col("est_both") - col("est_prior"), 6).as("est_new"),
        when(coalesce(col("n_true_new"), lit(0L)) > 0L,
          round((round(col("est_both") - col("est_prior"), 6)
            - col("n_true_new")) / col("n_true_new"), 6)).as("rel_err"))
  }
}
