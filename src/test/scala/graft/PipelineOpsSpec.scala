package graft

import org.apache.spark.sql.functions._
import graft.operators.{Relational, Sessionize, Similarity, TextOps}

/** Edge-case coverage for the paragraph-dedup / mixture-weights /
  * covariance / hard-negative / outlier / event-dedup / Q18 / MERGE
  * operators; the value-exact path is the DuckDB oracle in graft.Oracles.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("paragraphDedup: cross-doc repeated window removed, remainder reassembled in order") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "a b c d e f g h x y"),
      (3L, "p q r s t u v w p q r s t u v w")
    ).toDF("doc_id", "text")
    val m = TextOps.paragraphDedup(docs)
      .select("doc_id", "n_chunks", "n_kept", "dedup_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(m(1L) === ((1L, 2L, 2L, "a b c d e f g h i j")))
    // doc 2's first window duplicates doc 1's; only the tail survives
    assert(m(2L) === ((2L, 2L, 1L, "x y")))
    // within-doc duplicate window also removed
    assert(m(3L) === ((3L, 2L, 1L, "p q r s t u v w")))
  }

  test("paragraphDedup: doc with all windows duplicated keeps empty text") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "a b c d e f g h")
    ).toDF("doc_id", "text")
    val m = TextOps.paragraphDedup(docs)
      .select("doc_id", "n_kept", "dedup_text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(m(2L) === ((2L, 0L, "")))
  }

  test("mixtureWeights: alpha < 1 upweights small sources; allocation bounded by budget") {
    val docs = Seq.tabulate(100)(i => (i.toLong, "tok " * 100, "big")) ++
      Seq((200L, "tok tok tok tok tok", "small"))
    val df = docs.toDF("doc_id", "text", "source")
    val out = TextOps.mixtureWeights(df, alpha = 0.7, budgetTokens = 1000L)
      .select("source", "n_tokens", "weight", "alloc_tokens")
      .as[(String, Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    val (bigTok, smallTok) = (out("big")._2, out("small")._2)
    val smallShare = smallTok.toDouble / (bigTok + smallTok)
    assert(out("small")._3 > smallShare) // temperature upweights the small source
    assert(math.abs(out("big")._3 + out("small")._3 - 1.0) < 1e-5)
    assert(out("big")._4 + out("small")._4 <= 1000L)
  }

  test("embedCovariance: matches hand-computed variance/covariance, upper triangle only") {
    val emb = Seq(
      (1L, Array(1.0f, 2.0f), 0),
      (2L, Array(3.0f, 4.0f), 0),
      (3L, Array(5.0f, 6.0f), 0)
    ).toDF("vec_id", "embedding", "label")
    val m = Similarity.embedCovariance(emb, dims = 2)
      .select("dim_i", "dim_j", "n_vecs", "cov")
      .as[(Long, Long, Long, Double)].collect().map(r => (r._1, r._2) -> r).toMap
    assert(m.keySet === Set((1L, 1L), (1L, 2L), (2L, 2L)))
    // x,y both {1,3,5}/{2,4,6}: every cell is 8/3
    m.values.foreach { case (_, _, n, cov) =>
      assert(n === 3L); assert(math.abs(cov - 8.0 / 3.0) < 1e-5)
    }
  }

  test("hardNegatives: only cross-label neighbours, ranked by cosine") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),
      (1L, Array(1.0f, 0.01f), 0),  // same label: must never appear
      (2L, Array(1.0f, 0.1f), 1),   // closest cross-label
      (3L, Array(0.0f, 1.0f), 1),
      (4L, Array(1.0f, 0.2f), 2)
    ).toDF("vec_id", "embedding", "label")
    val rows = Similarity.hardNegatives(emb, maxQueryId = 1, k = 3)
      .select("q_id", "n_id", "n_label", "rnk")
      .as[(Long, Long, Int, Long)].collect().sortBy(_._4)
    assert(rows.map(_._2).toSeq === Seq(2L, 4L, 3L)) // by descending cosine
    assert(!rows.map(_._3).contains(0))
  }

  test("embedOutliers: the off-distribution vector is flagged, tight cluster is not") {
    val cluster = (1L to 9L).map(i => (i, Array(1.0f, 0.001f * i), 0))
    val outlier = Seq((10L, Array(-1.0f, 0.0f), 0))
    val emb = (cluster ++ outlier).toDF("vec_id", "embedding", "label")
    val m = Similarity.embedOutliers(emb, outFrac = 0.1)
      .select("vec_id", "is_outlier").as[(Long, Boolean)].collect().toMap
    assert(m(10L) === true)
    assert((1L to 9L).forall(i => !m(i)))
  }

  test("dedupEvents: repeats inside the window dropped, after the window kept") {
    val base = 1700000000000000L
    val events = Seq(
      (1L, base, 7L, "click"),
      (2L, base + 60L * 1000000L, 7L, "click"),          // +1 min: dup
      // +35 min: 34 min after its immediate predecessor (the dropped dup),
      // which is what the declarative relaxation measures against
      (3L, base + 35L * 60L * 1000000L, 7L, "click"),
      (4L, base + 60L * 1000000L, 7L, "purchase"),       // other type: kept
      (5L, base + 2L * 1000000L, 8L, "click")            // other user: kept
    ).toDF("event_id", "us_raw", "user_id", "event_type")
      .select(col("event_id"), timestamp_micros(col("us_raw")).as("ts"),
        col("user_id"), col("event_type"))
    val out = Sessionize.dedupEvents(events, windowMinutes = 30)
      .select("event_id", "gap_us").as[(Long, Long)].collect().toMap
    assert(out.keySet === Set(1L, 3L, 4L, 5L))
    assert(out(1L) === -1L)
    assert(out(3L) === 34L * 60L * 1000000L)
  }

  test("tpchQ18: only orders above the quantity threshold survive, top-ordered") {
    val lineitem = Seq(
      (100L, 200.0), (100L, 150.0),  // order 100: 350 > 300
      (101L, 100.0), (101L, 100.0),  // order 101: 200 <= 300
      (102L, 301.0)                  // order 102: 301 > 300
    ).toDF("l_orderkey", "l_quantity")
    val orders = Seq(
      (100L, 1L, 1000.0), (101L, 1L, 2000.0), (102L, 2L, 500.0)
    ).toDF("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Seq((1L, "alice"), (2L, "bob")).toDF("c_custkey", "c_name")
    val rows = Relational.tpchQ18(customer, orders, lineitem)
      .select("o_orderkey", "c_name", "total_cents", "sum_qty")
      .as[(Long, String, Long, Long)].collect()
    assert(rows.map(_._1).toSeq === Seq(100L, 102L)) // ordered by price desc
    assert(rows.head === ((100L, "alice", 100000L, 350L)))
  }

  test("mergeUpsert: delete removes, upsert overwrites, insert appends, base passes through") {
    val base = Seq(
      (1L, "en", "s1", 10L), (2L, "en", "s1", 20L), (3L, "fr", "s2", 30L)
    ).toDF("doc_id", "lang", "source", "n_chars")
    val changes = Seq(
      (2L, "delete", 20L, "en", "s1"),
      (3L, "upsert", 999L, "fr", "s2"),
      (4L, "upsert", 40L, "new", "s3")
    ).toDF("doc_id", "op", "n_chars", "lang", "source")
    val m = Relational.mergeUpsert(base, changes)
      .select("doc_id", "n_chars", "row_origin")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(m.keySet === Set(1L, 3L, 4L))
    assert(m(1L) === ((1L, 10L, "base")))
    assert(m(3L) === ((3L, 999L, "updated")))
    assert(m(4L) === ((4L, 40L, "inserted")))
  }
}
