package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  private lazy val left = Seq(
    (10L, 1L, 100L), // after both right rows for key 1
    (11L, 1L, 50L),  // exactly at the second right row
    (12L, 1L, 5L),   // before any right row -> null
    (13L, 2L, 70L)   // key 2 has its own right timeline
  ).toDF("l_id", "user_id", "ts")

  private lazy val right = Seq(
    (100L, 1L, 20L),
    (101L, 1L, 50L),
    (102L, 2L, 60L),
    (103L, 3L, 10L) // key never on the left -> dropped
  ).toDF("r_id", "user_id", "r_ts")

  private def run() =
    AsOf.asofJoin(left, right, "user_id", "ts", "r_ts")
      .select("l_id", "r_id").as[(Long, Option[Long])].collect().toMap

  test("picks the most recent right row at-or-before each left ts") {
    val m = run()
    assert(m(10L) === Some(101L)) // 50 < 100, latest wins over 20
    assert(m(13L) === Some(102L))
  }

  test("a right row at the exact same instant is visible") {
    assert(run()(11L) === Some(101L))
  }

  test("no right row at-or-before -> null match") {
    assert(run()(12L) === None)
  }

  test("right rows tied on (key, ts) resolve deterministically") {
    val tied = Seq((200L, 1L, 20L), (201L, 1L, 20L)).toDF("r_id", "user_id", "r_ts")
    val out = AsOf.asofJoin(left.filter($"l_id" === 10L), tied, "user_id", "ts", "r_ts")
      .select("r_id").as[Option[Long]].collect()
    // _r-struct tiebreak: the greatest payload wins, run after run
    assert(out.toSeq === Seq(Some(201L)))
  }
}
