package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.{Graph, Relational, Sessionize, TextOps, TfIdf}

/** Round-8 operators: sentence stats, readability, tokenizer-id
  * application, keyword extraction, token triangles, trailing EWMA,
  * session entry paths, per-language unpivot. */
class Round8OpsSpec extends SparkSpec {
  import spark.implicits._

  test("sentenceStats segments on terminal punctuation and averages exactly") {
    val docs = Seq((1L, "One two. Three four five! Six?"), (2L, "!!!"))
      .toDF("doc_id", "text")
    val out = TextOps.sentenceStats(docs)
      .as[(Long, Long, Long, Double, Double)].collect()
    // doc 2 has no non-empty sentences and is excluded
    assert(out.toSeq === Seq((1L, 3L, 15L, 8.333333, 2.0))) // 25/3, 6dp
  }

  test("readability scores the Flesch formula with vowel-group syllables") {
    val docs = Seq((1L, "The cat sat.")).toDF("doc_id", "text")
    val Array((id, w, s, syl, f)) =
      TextOps.readability(docs).as[(Long, Long, Long, Long, Double)].collect()
    assert((id, w, s, syl) === (1L, 3L, 1L, 3L))
    // 206.835 - 1.015*(3/1) - 84.6*(3/3), rounded 6dp
    assert(math.abs(f - 119.190) < 1e-9)
  }

  test("tokenizeIds maps the frequent tail to dense ids and the rest to OOV 0") {
    val docs = Seq(
      (1L, "alpha beta alpha"), (2L, "alpha beta"), (3L, "alpha rare")
    ).toDF("doc_id", "text")
    val out = TextOps.tokenizeIds(docs, minDf = 2)
      .orderBy("doc_id", "pos")
      .as[(Long, Long, String, Long)].collect()
    // df: alpha=3, beta=2, rare=1 → vocab ids alpha=1, beta=2, rare=OOV 0
    assert(out.toSeq === Seq(
      (1L, 1L, "alpha", 1L), (1L, 2L, "beta", 2L), (1L, 3L, "alpha", 1L),
      (2L, 1L, "alpha", 1L), (2L, 2L, "beta", 2L),
      (3L, 1L, "alpha", 1L), (3L, 2L, "rare", 0L)))
  }

  test("keywordExtract returns at most k ranked keywords, ties on token") {
    val docs = Seq(
      (1L, "apple apple banana cherry"), (2L, "banana cherry"), (3L, "date")
    ).toDF("doc_id", "text")
    val out = TfIdf.keywordExtract(docs, k = 2)
    val byDoc = out.as[(Long, Long, String, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    assert(byDoc.keySet === Set(1L, 2L, 3L))
    assert(byDoc(1L).length === 2 && byDoc(3L).length === 1)
    // doc 1: apple tf=2 with df=1 outranks everything else
    assert(byDoc(1L).head._3 === "apple")
    // ranks are 1..n and contiguous
    assert(byDoc(2L).map(_._2).toSeq === Seq(1L, 2L))
  }

  test("tokenTriangles counts each triangle once per corner token") {
    // a-b, b-c, a-c co-occur in >= 2 docs → one triangle; d attaches to a
    // only (no second edge), so no second triangle
    val docs = (1L to 2L).map(i => (i, "aa bb cc dd")).toDF("doc_id", "text")
    val out = Graph.tokenTriangles(docs, minPairDocs = 2)
      .as[(String, Long)].collect().toMap
    // all C(4,3)=4 triangles over the complete 4-clique: each token in 3
    assert(out === Map("aa" -> 3L, "bb" -> 3L, "cc" -> 3L, "dd" -> 3L))
    val sparse = Seq((1L, "aa bb cc"), (2L, "aa bb cc"), (3L, "aa dd"), (4L, "aa dd"))
      .toDF("doc_id", "text")
    val out2 = Graph.tokenTriangles(sparse, minPairDocs = 2)
      .as[(String, Long)].collect().toMap
    // aa-dd edge exists but dd has no edge to bb/cc → only the abc triangle
    assert(out2 === Map("aa" -> 1L, "bb" -> 1L, "cc" -> 1L))
  }

  test("eventsEwma halving decay: hand-computed weights, exact dyadic sums") {
    val events = Seq(
      (1L, 1L, "2024-01-01 10:00:00", 1.0),
      (2L, 1L, "2024-01-01 10:01:00", 2.0),
      (3L, 1L, "2024-01-01 10:02:00", 4.0))
      .map { case (e, u, ts, v) => (e, u, Timestamp.valueOf(ts), v) }
      .toDF("event_id", "user_id", "ts", "value")
    val out = Relational.eventsEwma(events).orderBy("event_id")
      .select("event_id", "n_win", "ewma").as[(Long, Long, Double)].collect()
    // e1: 100/1; e2: (0.5*100 + 200)/1.5 = 166.666667 (6dp);
    // e3: (0.25*100 + 0.5*200 + 400)/1.75 = 300
    assert(out.toSeq === Seq(
      (1L, 1L, 100.0), (2L, 2L, 166.666667), (3L, 3L, 300.0)))
  }

  test("sessionPaths reports ordered first-k entry paths per session") {
    val events = Seq(
      (1L, 1L, "2024-01-01 10:00:00", "view"),
      (2L, 1L, "2024-01-01 10:01:00", "click"),
      (3L, 1L, "2024-01-01 10:02:00", "purchase"),
      (4L, 1L, "2024-01-01 10:03:00", "view"), // 4th event: beyond k=3
      (5L, 1L, "2024-01-01 12:00:00", "view"), // new session (gap > 30min)
      (6L, 2L, "2024-01-01 09:00:00", "view"),
      (7L, 2L, "2024-01-01 09:05:00", "click"))
      .map { case (e, u, ts, t) => (e, u, Timestamp.valueOf(ts), t) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = Sessionize.sessionPaths(events).as[(String, Long)].collect().toMap
    assert(out === Map("view>click>purchase" -> 1L, "view" -> 1L, "view>click" -> 1L))
  }

  test("langUnpivot emits three metric rows per language with exact values") {
    val docs = Seq((1L, "en", 10L), (2L, "en", 20L), (3L, "fr", 7L))
      .toDF("doc_id", "lang", "n_chars")
    val out = Relational.langUnpivot(docs)
      .as[(String, String, Double)].collect().toSet
    assert(out === Set(
      ("en", "n_docs", 2.0), ("en", "avg_chars", 15.0), ("en", "max_chars", 20.0),
      ("fr", "n_docs", 1.0), ("fr", "avg_chars", 7.0), ("fr", "max_chars", 7.0)))
  }
}
