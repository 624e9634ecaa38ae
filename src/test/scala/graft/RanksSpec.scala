package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Ranks

/** The two-pass range-partitioned global rank must be value-identical to
  * the single-partition `Window.orderBy` it replaces — row_number,
  * percent_rank, and ntile (including ragged n%k buckets and n<k), at a
  * partition count that forces real range splits. */
class RanksSpec extends SparkSpec {

  private def check(n: Long, k: Int): Unit = {
    // non-monotonic values with ties on v; id breaks them to a total order
    val df = spark.range(n).select(col("id"),
      pmod(col("id") * 7919, lit(101)).as("v"))
    val order = Seq(col("v").desc, col("id"))
    val got = Ranks.withGlobalRowNumber(df, "rnk", "n_rows", order)
      .select(col("id"), col("rnk").cast("long").as("rnk"),
        round(Ranks.percentRankFromRank(col("rnk"), col("n_rows")), 9).as("pr"),
        Ranks.ntileFromRank(col("rnk"), col("n_rows"), k).cast("long").as("tile"))
    val w = Window.orderBy(order: _*)
    val want = df.select(col("id"),
      row_number().over(w).cast("long").as("rnk"),
      round(percent_rank().over(w), 9).as("pr"),
      ntile(k).over(w).cast("long").as("tile"))
    val mismatches = got.join(want, Seq("id"))
      .filter(got("rnk") =!= want("rnk") || got("pr") =!= want("pr")
        || got("tile") =!= want("tile"))
      .count()
    assert(mismatches === 0, s"n=$n k=$k: $mismatches rows diverge from Window")
  }

  test("matches Window row_number/percent_rank/ntile on ragged buckets (n%k != 0)") {
    check(997, 4) // 997 = 4*249+1: one big bucket, three small
  }

  test("matches Window with even buckets and a different k") {
    check(1000, 8)
  }

  test("n < k: every row its own tile, percent_rank still exact") {
    check(3, 10)
  }

  test("single row: rank 1, percent_rank 0 (no divide-by-zero)") {
    check(1, 4)
  }
}
