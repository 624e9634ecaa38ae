package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Sessionize

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Seq(
    // user 1: two sessions (65-min gap between e2 and e3)
    (1L, 1L, "2024-01-01 10:00:00"),
    (2L, 1L, "2024-01-01 10:20:00"),
    (3L, 1L, "2024-01-01 11:25:00"),
    (4L, 1L, "2024-01-01 11:40:00"),
    // user 2: one session
    (5L, 2L, "2024-01-01 09:00:00"),
    (6L, 2L, "2024-01-01 09:29:59"))
    .map { case (e, u, ts) => (e, u, Timestamp.valueOf(ts)) }
    .toDF("event_id", "user_id", "ts")

  test("byLag splits on the gap, counts events per session") {
    val out = Sessionize.byLag(events).orderBy("user_id", "session_id")
      .select("user_id", "session_id", "n_events").as[(Long, Long, Long)].collect()
    assert(out.toSeq === Seq((1L, 1L, 2L), (1L, 2L, 2L), (2L, 1L, 2L)))
  }

  test("exact-gap boundary: both implementations keep the event in-session") {
    val ev = Seq((1L, 1L, "2024-01-01 10:00:00"), (2L, 1L, "2024-01-01 10:30:00"))
      .map { case (e, u, ts) => (e, u, Timestamp.valueOf(ts)) }
      .toDF("event_id", "user_id", "ts")
    assert(Sessionize.byLag(ev).count() === 1)
    assert(Sessionize.bySessionWindow(ev).count() === 1)
  }

  test("byLag and bySessionWindow agree on session structure") {
    val lag = Sessionize.byLag(events)
      .select(col("user_id"), col("session_start_us"), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    val sw = Sessionize.bySessionWindow(events)
      .select(col("user_id"), unix_micros(col("session_start")), col("n_events"))
      .as[(Long, Long, Long)].collect().toSet
    assert(lag === sw)
  }
}
