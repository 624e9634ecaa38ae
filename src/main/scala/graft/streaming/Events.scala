package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Structured Streaming twin of Relational.eventsWindow (C4): tumbling
  * 1-hour window counts with a watermark bounding state. The same
  * aggregation expressions serve batch and stream — the Spark way of
  * keeping the two paths consistent.
  */
object Events {

  /** Windowed aggregation usable on a streaming or batch events frame. */
  def windowedCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame = {
    val withWm =
      if (events.isStreaming) events.withWatermark("ts", watermark) else events
    withWm
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(round(col("value") * 100).cast("long")).as("sum_value_cents"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"), col("n_events"), col("sum_value_cents"))
  }
}
