package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

class NGramShingleHashSpec extends SparkSpec {
  import spark.implicits._

  private lazy val texts = {
    val rnd = new scala.util.Random(29)
    val vocab = Seq("alpha", "beta", "gamma", "delta", "epsilon", "zeta")
    (0 until 200).map { i =>
      val len = rnd.nextInt(12)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }.toDF("doc_id", "text")
  }

  test("native shingles are bit-identical to the declarative form") {
    val diff = texts.select(
      Dedup.shingles(col("text")).as("native"),
      Dedup.shinglesDeclarative(col("text")).as("decl"))
      .filter(col("native") =!= col("decl"))
      .count()
    assert(diff === 0)
  }

  test("short and empty inputs yield empty shingle sets") {
    val out = Seq((1L, ""), (2L, "one two")).toDF("doc_id", "text")
      .select(Dedup.shingles(col("text")).as("sh")).as[Seq[Long]].collect()
    assert(out.forall(_.isEmpty)) // fewer than n=3 tokens
  }

  test("messy text (urls, digits, punctuation) matches declarative too") {
    val messy = Seq(
      (1L, "Visit https://x.io NOW!! for 42 things, ok ok ok ok"),
      (2L, "  spaced   out   tokens   here   again  ")).toDF("doc_id", "text")
    val diff = messy.select(
      Dedup.shingles(col("text")).as("native"),
      Dedup.shinglesDeclarative(col("text")).as("decl"))
      .filter(col("native") =!= col("decl")).count()
    assert(diff === 0)
  }
}
