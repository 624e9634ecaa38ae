package graft

import org.apache.spark.sql.functions._
import graft.operators.TextOps

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("text").select(TextOps.cleanText(col("text"))).as[String].head()

  test("cleanText strips urls") {
    assert(clean("go to https://example.com/x now") === "go to now")
    assert(clean("see www.example.org too") === "see too")
  }

  test("cleanText strips mentions, hashtags, entities") {
    assert(clean("hi @user and #topic &amp; more") === "hi and more")
  }

  test("cleanText strips digits and punctuation, lowers, collapses") {
    assert(clean("It is 42!!!  REALLY,   ok?") === "it is really ok")
  }

  test("cleanText of empty and symbol-only strings") {
    assert(clean("") === "")
    assert(clean("12345 !!! ...") === "")
  }

  test("tokens drops empties") {
    val toks = Seq("  Hello,   WORLD  7 ").toDF("text")
      .select(TextOps.tokens(col("text"))).as[Seq[String]].head()
    assert(toks === Seq("hello", "world"))
  }

  test("tokenCounts and tokenStats") {
    val df = Seq((1L, "one two three"), (2L, "a b4c d!e")).toDF("doc_id", "text")
    val tc = TextOps.tokenCounts(df).as[(Long, Long)].collect().toMap
    // "a b4c d!e" cleans to "a bc d e" -> 4 tokens
    assert(tc === Map(1L -> 3L, 2L -> 4L))
  }

  test("quality score bounds") {
    val df = Seq((1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "!!!???...")).toDF("doc_id", "text")
    val rows = TextOps.qualityScore(df).orderBy("doc_id").collect()
    val good = rows(0).getAs[Double]("quality")
    val bad = rows(1).getAs[Double]("quality")
    assert(good > 0.5 && good <= 1.0)
    assert(bad < 0.1)
  }

  test("langId picks marker-majority language, und when none") {
    val df = Seq((1L, "the cat is on the mat"), (2L, "le chat est la"),
      (3L, "zzz yyy xxx")).toDF("doc_id", "text")
    val out = TextOps.langId(df).as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "en", 2L -> "fr", 3L -> "und"))
  }

  test("fingerprint is order-sensitive and deterministic") {
    val df = Seq((1L, "alpha beta"), (2L, "beta alpha"), (3L, "alpha beta"))
      .toDF("doc_id", "text")
    val fp = TextOps.fingerprint(df).select("doc_id", "fingerprint")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(3L))
    assert(fp(1L) !== fp(2L))
  }
}
