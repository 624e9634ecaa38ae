package graft

import graft.operators.{Dedup, Graph, LangModel, Relational}
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("tokenPagerank: hub token outranks leaf tokens; ranks positive and bounded") {
    // star graph: 'hub' co-occurs with every leaf, leaves only with hub
    val d = Seq(
      (1L, "hub alpha"), (2L, "hub beta"), (3L, "hub gamma"),
      (4L, "hub delta"), (5L, "hub epsilon")).toDF("doc_id", "text")
    val r = Graph.tokenPagerank(d).collect()
      .map(x => (x.getString(0), x.getDouble(1))).toMap
    assert(r.size == 6)
    val leaves = r.filter(_._1 != "hub").values
    assert(leaves.forall(r("hub") > _), s"hub must dominate: $r")
    assert(r.values.forall(v => v > 0 && v < 1))
    // leaves are symmetric → identical ranks
    assert(leaves.toSet.size == 1, s"symmetric leaves must tie: $r")
  }

  test("tokenPagerank ranks sum to ~1 on a closed graph (no dangling mass)") {
    val d = Seq((1L, "a b"), (2L, "b c"), (3L, "c a")).toDF("doc_id", "text")
    val total = Graph.tokenPagerank(d).agg(sum("rank")).as[Double].head()
    assert(math.abs(total - 1.0) < 1e-6, s"ranks summed to $total")
  }

  test("docPerplexity: the repetitive doc scores lower NLL than the odd one out") {
    // doc 4's transitions are unique; docs 1-3 share all their bigrams
    val d = Seq(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the cat sat"),
      (4L, "zebra quantum flux")).toDF("doc_id", "text")
    val r = LangModel.docPerplexity(d).collect()
      .map(x => (x.getLong(0), x.getDouble(3))).toMap
    assert(r(4L) > r(1L), s"rare transitions must surprise the LM: $r")
    assert(r(1L) == r(2L) && r(2L) == r(3L))
  }

  test("editDistancePairs finds the one-word-changed near-dup and gates the rest") {
    // 50 tokens with ONE changed at the tail → 47/49 shingle Jaccard, which
    // deterministically collides in a band (verified against the md5 twin)
    val toks = for (a <- 'a' to 'h'; b <- 'a' to 'g') yield s"$a$b"
    val base = toks.take(50).mkString(" ")
    val variant = (toks.take(49) :+ "zz").mkString(" ")
    val d = Seq(
      (1L, base), (2L, variant),
      (3L, "totally different words about other topics entirely unrelated material herein contained text")
    ).toDF("doc_id", "text")
    val pairs = Dedup.editDistancePairs(d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)), s"got $pairs")
  }

  test("eventsAnomaly flags only spikes with enough history") {
    // alternating base values: non-zero variance so z is defined
    val base = (1 to 30).map(i =>
      (i.toLong, 100L + i.toLong * 1000000L, if (i % 2 == 0) 5.0 else 7.0))
    val spike = Seq((31L, 200000000L, 400.0))
    val df = (base ++ spike).toDF("event_id", "us_raw", "value")
      .select(col("event_id"), lit(7L).as("user_id"),
        timestamp_micros(col("us_raw")).as("ts"), col("value"))
    val out = Relational.eventsAnomaly(df).collect()
    assert(out.map(_.getLong(0)).toSet == Set(31L),
      s"only the spike should flag: ${out.mkString(",")}")
    assert(math.abs(out.head.getAs[Double]("z")) >= 3.0)
  }
}
