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

  test("wminhash signature plan is shuffle-free") {
    val plan = operators.Dedup.wminhashSigArr(corpus, 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"expected a narrow plan, got:\n$plan")
  }
}
