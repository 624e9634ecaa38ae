package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-17 regressions: the token_hits checkpointed loop, the
  * driver-side bigram_greedy_gen chain, the native graft_unit_norm
  * expression behind embed_isotropy, the statestore query surface, and
  * the four r16 ADVICE fixes (bitmap floor-div/pmod indexing,
  * simpsons_paradox NULL-flip coalesce, word-Levenshtein null slots). */
class Round17Spec extends SparkSpec {

  import spark.implicits._

  test("tokenHits: hand-checked 3-node chain survives the per-half-step checkpoint") {
    // a->b (w2), b->c (w1): 3 max-normed mutual-reinforcement rounds by
    // hand give hub(a)=1, hub(b)=2^-6, auth(b)=1, auth(c)=2^-5; sources
    // with no in-edges / sinks with no out-edges coalesce to 0
    val docs = Seq("a b", "a b", "b c").toDF("text")
    val r = operators.Graph.tokenHits(docs).collect()
      .map(x => x.getString(0) -> (x.getDouble(1), x.getDouble(2))).toMap
    assert(r("a") == (1.0, 0.0))
    assert(r("b") == (0.015625, 1.0))
    assert(r("c") == (0.0, 0.03125))
    CacheTracker.drainAll(spark)
  }

  test("bigramGreedyGen: driver-side chain matches hand argmax and stops at a dead end") {
    // uni argmax = b (3); b's argmax successor = c; c has no out-edges,
    // so the chain ends at step 1 even with steps=10 — the same rows the
    // old empty-join-empty-union unroll produced
    val docs = Seq("a b", "a b", "b c").toDF("text")
    val rows = operators.LangModel.bigramGreedyGen(docs).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(rows.toSeq == Seq((0, "b", 3L), (1, "c", 1L)))
    CacheTracker.drainAll(spark)
  }

  test("bigramGreedyGen: empty corpus yields an empty typed frame") {
    val docs = Seq.empty[String].toDF("text")
    val out = operators.LangModel.bigramGreedyGen(docs)
    assert(out.count() == 0L)
    assert(out.schema.map(_.name) == Seq("step", "token", "cnt"))
    CacheTracker.drainAll(spark)
  }

  test("graft_unit_norm is bit-identical to the declarative HOF unit-normalize") {
    val emb = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(-0.1f, 0.27f, 1e-4f, -3.7f)),
      (3L, Array(1e18f, -2e18f, 5e17f)),
      (4L, Array(1e-30f, -1e-30f)),
      (5L, Array(0.123456789f, 0.987654321f, -0.5f))
    ).toDF("vec_id", "embedding")
    val nrm = sqrt(aggregate(col("embedding"), lit(0.0),
      (a, x) => a + x.cast("double") * x.cast("double")))
    val both = emb.select(
      functions.GraftFunctions.unitNorm(col("embedding")).as("native"),
      transform(col("embedding"),
        x => round(x.cast("double") / nrm, 9)).as("declarative"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Double](0) == r.getSeq[Double](1),
        s"native ${r.getSeq[Double](0)} != declarative ${r.getSeq[Double](1)}")
    }
  }

  test("graft_unit_norm edges: empty, zero-norm, and null-element vectors are NULL") {
    val emb = Seq(
      (1L, Some(Array(0.0f, 0.0f))),          // zero norm
      (2L, Some(Array.empty[Float])),          // empty
      (3L, None: Option[Array[Float]]),        // null input
      (4L, Some(Array(1.0f, 2.0f)))            // healthy
    ).toDF("vec_id", "embedding")
    val out = emb.select(col("vec_id"),
      functions.GraftFunctions.unitNorm(col("embedding")).as("u"))
      .collect().map(r => r.getLong(0) -> (r.get(1) != null)).toMap
    assert(out == Map(1L -> false, 2L -> false, 3L -> false, 4L -> true))
    // null ELEMENT inside the array (built via SQL so containsNull=true)
    functions.GraftFunctions.register(spark)
    val withNull = spark.sql(
      "SELECT graft_unit_norm(array(CAST(1.0 AS FLOAT), CAST(NULL AS FLOAT)))")
      .collect().head
    assert(withNull.isNullAt(0))
  }

  test("graft_unit_norm from SQL: 3-4-5 vector, and array<double> input") {
    functions.GraftFunctions.register(spark)
    val f = spark.sql(
      "SELECT graft_unit_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))")
      .collect().head.getSeq[Double](0)
    assert(f == Seq(0.6, 0.8))
    val d = spark.sql("SELECT graft_unit_norm(array(3.0D, 4.0D))")
      .collect().head.getSeq[Double](0)
    assert(d == Seq(0.6, 0.8))
  }

  test("embedIsotropy: identical unit vectors read mean_pairwise_cos = 1") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val r = operators.Similarity.embedIsotropy(emb).collect().head
    assert(r.getAs[Long]("n_vecs") == 3L)
    assert(r.getAs[Double]("mean_pairwise_cos") == 1.0)
  }

  test("embedIsotropy: orthogonal pair reads mean_pairwise_cos = 0; zero vectors drop") {
    val emb = Seq(
      (1L, Array(1.0f, 0.0f)),
      (2L, Array(0.0f, 1.0f)),
      (3L, Array(0.0f, 0.0f)) // zero norm: excluded from n_vecs
    ).toDF("vec_id", "embedding")
    val r = operators.Similarity.embedIsotropy(emb).collect().head
    assert(r.getAs[Long]("n_vecs") == 2L)
    assert(r.getAs[Double]("mean_pairwise_cos") == 0.0)
  }

  test("bitmapOverlapMatrix: negative user_ids keep set semantics (pmod/floor-div words)") {
    // -33..1 span three words under floor semantics (-2, -1, 0); the old
    // div/% indexing collided -31..31 into word 0 with wrong bits
    val ev = Seq(
      ("x", -33L), ("x", -32L), ("x", -31L), ("x", -1L), ("x", 0L), ("x", 1L),
      ("y", -31L), ("y", 1L), ("y", 5L),
      ("y", -31L) // duplicate event: BIT_OR must be idempotent
    ).toDF("event_type", "user_id")
    val r = operators.Sketches.bitmapOverlapMatrix(ev).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_a") == 6L && row.getAs[Long]("n_b") == 3L)
    assert(row.getAs[Long]("n_both") == 2L) // {-31, 1}
    assert(row.getAs[Double]("jaccard") == math.rint(2.0 / 7.0 * 1e6) / 1e6)
  }

  test("simpsonsParadox: constant-x groups count zero flips, not NULL") {
    // n_chars constant within each lang -> every per-lang slope is NULL
    // (Spark divide-by-zero); the coalesced flip must make
    // n_sign_flips 0 and full_paradox false, matching the oracle's
    // CASE ... ELSE 0 instead of a NULL-poisoned sum
    val docs = Seq(
      (1L, "the quick brown fox jumps over it", "en", "web", 10L),
      (2L, "zz", "en", "web", 10L),
      (3L, "a of the and to", "fr", "web", 20L),
      (4L, "qq ww", "fr", "web", 20L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val r = operators.TextOps.simpsonsParadox(docs).collect().head
    assert(r.getAs[Long]("n_groups") == 2L)
    assert(r.getAs[Long]("n_sign_flips") == 0L)
    assert(!r.getAs[Boolean]("full_paradox"))
    CacheTracker.drainAll(spark)
  }

  test("graft_word_lev: null tokens behave identically across array representations") {
    functions.GraftFunctions.register(spark)
    // literal (GenericArrayData) path
    val lit1 = spark.sql(
      "SELECT graft_word_lev(array(CAST(NULL AS STRING)), array(''))")
      .collect().head.getLong(0)
    assert(lit1 == 1L, "null token must NOT equal empty string")
    val lit0 = spark.sql(
      "SELECT graft_word_lev(array(CAST(NULL AS STRING)), array(CAST(NULL AS STRING)))")
      .collect().head.getLong(0)
    assert(lit0 == 0L, "null token equals null token")
    // UnsafeArrayData path: force rows through an exchange so arrays
    // arrive as Unsafe — the pre-fix getUTF8String read a null slot as
    // an EMPTY string here and scored 0
    val df = Seq((Seq[String](null), Seq(""))).toDF("x", "y").repartition(2)
    val unsafe1 = df.selectExpr("graft_word_lev(x, y)").collect().head.getLong(0)
    assert(unsafe1 == 1L,
      "Unsafe representation must score null-vs-empty the same as Generic")
  }

  test("stateStoreRead: committed checkpoint state equals the batch aggregate") {
    val ev = Seq(
      ("click", 1.0), ("click", 2.5), ("view", 0.005),
      ("view", -0.005), ("purchase", 10.0), ("click", 0.994)
    ).toDF("event_type", "value")
    val got = streaming.Events.stateStoreRead(ev)
      .as[(String, Long, Long)].collect().toSet
    val want = ev
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("c"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == want, s"state $got != batch $want")
  }
}
