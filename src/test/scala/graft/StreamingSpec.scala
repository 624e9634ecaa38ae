package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.Events

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  test("streaming windowed counts equal the batch twin") {
    implicit val sqlCtx = spark.sqlContext
    val data = Seq(
      ("2024-01-01 10:05:00", "click", 1.25),
      ("2024-01-01 10:45:00", "click", 2.50),
      ("2024-01-01 10:50:00", "view", 0.75),
      ("2024-01-01 11:10:00", "click", 4.00))
      .map { case (ts, et, v) => (Timestamp.valueOf(ts), et, v) }

    val stream = MemoryStream[(Timestamp, String, Double)]
    stream.addData(data: _*)
    val df = stream.toDF().toDF("ts", "event_type", "value")

    val q = Events.windowedCounts(df).writeStream
      .format("memory").queryName("win_out").outputMode("complete").start()
    q.processAllAvailable()
    q.stop()

    val streamed = spark.table("win_out")
      .as[(String, String, Long, Long)].collect().toSet

    val batch = Events.windowedCounts(
      data.toDF("ts", "event_type", "value"))
      .as[(String, String, Long, Long)].collect().toSet

    assert(streamed === batch)
    assert(batch === Set(
      ("2024-01-01 10:00:00", "click", 2L, 375L),
      ("2024-01-01 10:00:00", "view", 1L, 75L),
      ("2024-01-01 11:00:00", "click", 1L, 400L)))
  }
}
