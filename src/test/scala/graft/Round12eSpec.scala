package graft

import org.apache.spark.sql.DataFrame

/** Round-12e operators: time-series analytics over the event stream —
  * time-decay attribution, daily-revenue autocorrelation, Theil–Sen
  * robust trend. */
class Round12eSpec extends SparkSpec {
  import spark.implicits._

  private def events(rows: (Long, Long, String, String, Double)*): DataFrame =
    rows.map { case (e, u, t, ty, v) =>
      (e, u, java.sql.Timestamp.valueOf(t), ty, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")

  test("attributionTimeDecay: the nearer touch earns more, total is conserved") {
    val d = events(
      (1L, 1L, "2024-01-05 06:00:00", "click", 0.0),   // 6h before: w=e^-1
      (2L, 1L, "2024-01-05 11:00:00", "click", 0.0),   // 1h before: w=e^-1/6
      (3L, 1L, "2024-01-05 12:00:00", "purchase", 10.0))
    val out = graft.operators.Sessionize.attributionTimeDecay(d).collect()
      .map(r => r.getAs[Long]("click_hour") -> r.getAs[Double]("attributed_value"))
      .toMap
    assert(out.keySet === Set(6L, 11L))
    assert(out(11L) > out(6L)) // recency wins
    assert(math.abs(out(11L) + out(6L) - 1000.0) < 0.01) // cents conserved
    val w1 = math.exp(-1.0 / 6.0); val w2 = math.exp(-1.0)
    assert(math.abs(out(11L) - 1000.0 * w1 / (w1 + w2)) < 0.01)
  }

  test("attributionTimeDecay ignores clicks outside the 24h lookback") {
    val d = events(
      (1L, 2L, "2024-01-03 12:00:00", "click", 0.0),   // 48h before
      (2L, 2L, "2024-01-05 12:00:00", "purchase", 5.0))
    assert(graft.operators.Sessionize.attributionTimeDecay(d).count() === 0L)
  }

  test("revenueAcf reads a period-2 series as lag-1 negative, lag-2 positive") {
    // six days alternating 100/300 cents: dev = ∓100 around mean 200
    val d = events((1L to 6L).map { i =>
      (i, i, f"2024-01-${i}%02d 12:00:00", "purchase",
        if (i % 2 == 1) 1.0 else 3.0)
    }: _*)
    val out = graft.operators.Relational.revenueAcf(d).collect()
      .map(r => r.getAs[Int]("lag_days") -> r).toMap
    assert(out(1).getAs[Long]("n_pairs") === 5L)
    assert(math.abs(out(1).getAs[Double]("acf") - (-5.0 / 6)) < 1e-5)
    assert(out(2).getAs[Long]("n_pairs") === 4L)
    assert(math.abs(out(2).getAs[Double]("acf") - 4.0 / 6) < 1e-5)
  }

  test("theilSenTrend shrugs off the flash-sale outlier OLS would chase") {
    // four clean 100-cents/day steps plus one 1000x day at the end
    val d = events(
      (1L, 1L, "2024-01-01 12:00:00", "purchase", 1.0),
      (2L, 1L, "2024-01-02 12:00:00", "purchase", 2.0),
      (3L, 1L, "2024-01-03 12:00:00", "purchase", 3.0),
      (4L, 1L, "2024-01-04 12:00:00", "purchase", 4.0),
      (5L, 1L, "2024-01-05 12:00:00", "purchase", 1000.0))
    val r = graft.operators.Relational.theilSenTrend(d).collect().head
    assert(r.getAs[Long]("n_days") === 5L)
    assert(r.getAs[Long]("n_pairs") === 10L)
    assert(r.getAs[Double]("slope_cents_per_day") === 100.0)
    assert(r.getAs[Double]("intercept_cents") === 100.0)
  }
}
