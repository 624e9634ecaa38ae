package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row, the single most recent
  * right row with `right.ts <= left.ts` on the same key — the
  * market-data / feature-store join. DuckDB spells it `ASOF JOIN`, which
  * is exactly what the oracle uses: a genuinely independent second
  * implementation of the same semantics.
  *
  * Spark-first shape: NOT a non-equi range join (Spark would plan that as
  * a broadcast nested loop, and an unbounded `>=` pairs every left row
  * with every earlier right row before picking one). Instead both sides
  * are unioned, shuffled ONCE on the key, and a single ordered window
  * pass carries the latest right payload forward into each left row
  * (`last(_, ignoreNulls)` over unbounded-preceding). Cost: one shuffle +
  * one per-partition sort, the same plan shape at any scale — no
  * intermediate pair blow-up is possible.
  */
object AsOf {

  /** Left columns are preserved; right columns (minus the key) arrive
    * nullable, taken from the latest right row with rightTs <= leftTs for
    * the same key (null when no such row). Right column names must not
    * collide with left's. At the exact same timestamp the right row IS
    * visible to the left row; ties between right rows at the same
    * (key, ts) break deterministically on the right payload. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String): DataFrame = {
    val lCols = left.columns.toSeq
    val rCols = right.columns.toSeq.filterNot(_ == key)
    val lStruct = struct(lCols.map(col): _*)
    val rStruct = struct(rCols.map(col): _*)
    val lType = left.select(lStruct).schema.head.dataType
    val rType = right.select(rStruct).schema.head.dataType
    val l = left.select(col(key).as("_k"), col(leftTs).as("_ts"),
      lit(1).as("_side"), lit(null).cast(rType).as("_r"), lStruct.as("_l"))
    val r = right.select(col(key).as("_k"), col(rightTs).as("_ts"),
      lit(0).as("_side"), rStruct.as("_r"), lit(null).cast(lType).as("_l"))
    // right (_side 0) sorts before left (_side 1) at equal ts, so a right
    // row at the same instant is visible; _r orders equal-ts right rows
    val w = Window.partitionBy("_k").orderBy(col("_ts"), col("_side"), col("_r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_m", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(col("_k").as(key) +:
        (lCols.filterNot(_ == key).map(c => col(s"_l.$c").as(c)) ++
          rCols.map(c => col(s"_m.$c").as(c))): _*)
  }

  /** [[asofJoin]] with a match TOLERANCE (pandas merge_asof semantics):
    * the latest right row still matches only when leftTs − rightTs ≤
    * `tolerance`; a staler match is DISCARDED (right columns null) while
    * the left row survives — the feature-store rule that a feature older
    * than its freshness SLA must not silently join. Same one-shuffle
    * window plan as the base join; the tolerance is one post-projection,
    * so the scale shape is unchanged. */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String,
                        tolerance: Long): DataFrame = {
    val rCols = right.columns.toSeq.filterNot(_ == key)
    val joined = asofJoin(left, right, key, leftTs, rightTs)
      .withColumn("_keep",
        col(rightTs).isNotNull && col(leftTs) - col(rightTs) <= tolerance)
    rCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(col("_keep"), col(c)))
    }.drop("_keep")
  }

  /** Piecewise-LINEAR interpolation join (C254): each event reads the
    * daily revenue series at its exact timestamp, linearly interpolated
    * between the bracketing day marks — where the as-of family carries
    * the LAST value forward (a step function), this is the
    * time-weighted read a TWAP/financial pipeline wants between marks.
    * y = r_d + (r_{d+1} − r_d) · frac with frac the exact
    * micros-into-day fraction; events whose bracketing day is absent
    * yield NULL (no extrapolation — the honest edge). The day series is
    * calendar-bounded and broadcast twice (floor + ceil marks), so the
    * event stream is never shuffled at all. */
  def interpJoin(events: DataFrame): DataFrame = {
    val e = events.select(col("event_id"), unix_micros(col("ts")).as("us"),
      col("event_type"))
    val daily = events
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day_idx"))
      .agg(expr("CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)")
        .as("cents"))
    e.select(col("event_id"), col("event_type"), col("us"),
        expr("us div 86400000000").as("day_idx"),
        (expr("us % 86400000000").cast("double") / 86400000000.0).as("frac"))
      .join(broadcast(daily.select(col("day_idx"), col("cents").as("r0"))),
        Seq("day_idx"), "left")
      .join(broadcast(daily.select((col("day_idx") - 1).as("day_idx"),
        col("cents").as("r1"))), Seq("day_idx"), "left")
      .select(col("event_id"), col("event_type"), col("day_idx"),
        round(col("frac"), 9).as("frac"),
        round(col("r0").cast("double")
          + (col("r1").cast("double") - col("r0").cast("double")) * col("frac"), 6)
          .as("interp_cents"))
  }
}
