package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational engine breadth: columnar scan+agg, broadcast dimension join,
  * tumbling-window event aggregation (C1-C3).
  *
  * Money sums use per-row rounding to integer cents then exact bigint
  * summation — order-independent, so identical on Spark and the DuckDB
  * oracle regardless of partitioning (a plain double sum is not).
  */
object Relational {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  /** TPC-H-Q1-flavoured pricing summary over lineitem (C1). Narrow scan →
    * single partial-aggregated shuffle on the two low-cardinality keys;
    * projection and the shipdate filter push into the parquet scan. */
  def lineitemAgg(lineitem: DataFrame): DataFrame =
    lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        sum(col("l_quantity").cast("long")).as("sum_qty"),
        sum(cents(col("l_extendedprice"))).as("sum_base_cents"),
        sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("sum_disc_cents"),
        count(lit(1)).as("n_rows"),
        round(avg(col("l_quantity")), 6).as("avg_qty"))

  /** Revenue per nation: orders ⋈ customer ⋈ nation (C2). nation (25 rows)
    * is explicitly broadcast; orders⋈customer shuffles on custkey once —
    * at cluster scale both sides would be bucketed on custkey. */
  def ordersJoin(orders: DataFrame, customer: DataFrame, nation: DataFrame): DataFrame =
    orders
      .join(customer, orders("o_custkey") === customer("c_custkey"))
      .join(broadcast(nation), customer("c_nationkey") === nation("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).as("revenue_cents"))

  /** Tumbling 1-hour window aggregation over events (C3) — the batch twin
    * of the Structured Streaming query in graft.streaming.Events. */
  def eventsWindow(events: DataFrame): DataFrame =
    events
      .groupBy(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(cents(col("value"))).as("sum_value_cents"))
}
