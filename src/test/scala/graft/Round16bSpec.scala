package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-16 second-session operators: word-level Levenshtein / WER. */
class Round16bSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.map { case (id, text) => (id, text, "en", "web", text.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("graft_word_lev: hand-checked distances incl. substitution vs LCS indel") {
    functions.GraftFunctions.register(spark)
    val cases = Seq(
      ("a b c", "a b c", 0L),
      ("a b c", "a x c", 1L),      // one substitution (LCS-indel would say 2)
      ("a b c", "a b", 1L),        // one deletion
      ("a b", "a b c", 1L),        // one insertion (symmetry)
      ("q", "z", 1L),
      ("kitten sits here", "sitting sits there", 2L),
      ("a a b a", "a b a a", 2L))  // swap-shaped: two edits at word level
    cases.foreach { case (a, b, want) =>
      val got = spark.sql(
        s"SELECT graft_word_lev(split('$a', ' '), split('$b', ' ')) AS l")
        .collect().head.getLong(0)
      assert(got == want, s"word_lev($a, $b) = $got, want $want")
    }
    // empty side = length of the other
    val e = spark.sql(
      "SELECT graft_word_lev(CAST(array() AS array<string>), split('x y z', ' ')) AS l")
      .collect().head.getLong(0)
    assert(e == 3L)
  }

  test("graft_word_lev never exceeds max(len) and never undercuts |len diff| or the LCS bound") {
    assumeTestdata()
    functions.GraftFunctions.register(spark)
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toked = d.limit(40)
      .select(col("doc_id"), operators.TextOps.tokens(col("text")).as("toks"))
    val pairs = toked.select(col("doc_id").as("a_id"), col("toks").as("a"))
      .crossJoin(toked.select(col("doc_id").as("b_id"), col("toks").as("b")))
      .filter(col("a_id") < col("b_id"))
      .select(size(col("a")).cast("long").as("la"),
        size(col("b")).cast("long").as("lb"),
        functions.GraftFunctions.wordLev(col("a"), col("b")).as("d"),
        functions.GraftFunctions.lcsLen(col("a"), col("b")).as("lcs"))
    val bad = pairs.filter(
      col("d") > greatest(col("la"), col("lb")) ||
        col("d") < abs(col("la") - col("lb")) ||
        // lev >= max(la,lb) - lcs: every common-subsequence symbol saves
        // at most one edit
        col("d") < greatest(col("la"), col("lb")) - col("lcs")).count()
    assert(bad === 0L)
    CacheTracker.drainAll(spark)
  }

  test("werPairs: identical docs score 0, one-word substitution scores 1/len") {
    val text = "the quick brown fox jumps over the lazy dog again and again"
    val sub = "the quick brown fox jumps over the hazy dog again and again"
    val r = operators.Dedup.werPairs(docs((1L, text), (2L, text), (3L, sub)))
      .collect().map(x => (x.getAs[Long]("a_id"), x.getAs[Long]("b_id")) -> x).toMap
    val same = r((1L, 2L))
    assert(same.getAs[Long]("word_dist") == 0L)
    assert(same.getAs[Double]("wer") == 0.0)
    // the substituted doc still shares enough 3-gram bands to be a candidate
    for (k <- Seq((1L, 3L), (2L, 3L)); row <- r.get(k)) {
      assert(row.getAs[Long]("word_dist") == 1L)
      assert(math.abs(row.getAs[Double]("wer") - 1.0 / 12) < 1e-6)
    }
    CacheTracker.drainAll(spark)
  }
}
