package graft

import graft.functions.{GraftFunctions, MortonInterleave}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

class MortonSpec extends SparkSpec {
  import spark.implicits._

  test("morton compute matches hand-checked interleaves") {
    assert(MortonInterleave.compute(0L, 0L) == 0L)
    assert(MortonInterleave.compute(1L, 0L) == 1L)
    assert(MortonInterleave.compute(0L, 1L) == 2L)
    assert(MortonInterleave.compute(3L, 3L) == 15L)
    assert(MortonInterleave.compute(0x7FFFFFFFL, 0L) == 0x1555555555555555L)
    assert(MortonInterleave.compute(0L, 0x7FFFFFFFL) == 0x2AAAAAAAAAAAAAAAL)
    // the full key range is non-negative, so signed long order == z-order
    assert(MortonInterleave.compute(0x7FFFFFFFL, 0x7FFFFFFFL) > 0L)
  }

  test("morton rejects operands outside [0, 2^31) instead of corrupting the layout") {
    // bit 31 of y would land on the sign bit: sorting would put the upper
    // half of a 32-bit domain first — fail loudly rather than mis-cluster
    for ((x, y) <- Seq(0x80000000L -> 0L, 0L -> 0x80000000L, -1L -> 0L, 0L -> -1L))
      intercept[IllegalArgumentException](MortonInterleave.compute(x, y))
  }

  test("native expression matches the declarative shift-mask twin over 100k keys") {
    def spreadDecl(c0: Column): Column = {
      var v = c0.bitwiseAND(lit(0xFFFFFFFFL))
      for ((sh, m) <- Seq(16 -> 0x0000FFFF0000FFFFL, 8 -> 0x00FF00FF00FF00FFL,
        4 -> 0x0F0F0F0F0F0F0F0FL, 2 -> 0x3333333333333333L, 1 -> 0x5555555555555555L))
        v = v.bitwiseOR(shiftleft(v, sh)).bitwiseAND(lit(m))
      v
    }
    val df = spark.range(100000).select(
      pmod(xxhash64(col("id")), lit(1L << 31)).as("x"),
      pmod(xxhash64(col("id"), lit(1)), lit(1L << 31)).as("y"))
    val mismatches = df.select(
        GraftFunctions.morton(col("x"), col("y")).as("native"),
        spreadDecl(col("x")).bitwiseOR(shiftleft(spreadDecl(col("y")), 1)).as("decl"))
      .filter(col("native") =!= col("decl")).count()
    assert(mismatches == 0)
  }

  test("graft_morton is SQL-callable after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_morton(CAST(3 AS BIGINT), CAST(3 AS BIGINT)) AS z")
      .as[Long].head()
    assert(r == 15L)
  }

  test("zorder locality: sorting by zkey keeps both dimensions locally bounded") {
    // on a 256x256 grid in z-order, any 64-row run spans a bounded x/y range;
    // a lexicographic (x, y) sort makes runs span the FULL y range instead
    val grid = spark.range(256L * 256L).select(
      (col("id") / 256).cast("long").as("x"), pmod(col("id"), lit(256L)).as("y"))
    val byZ = grid.select(col("x"), col("y"),
        GraftFunctions.morton(col("x"), col("y")).as("z"))
      .orderBy("z").withColumn("run", monotonically_increasing_id() / 64)
    val spans = byZ.groupBy("run")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .agg(max(greatest(col("dx"), col("dy")))).as[Long].head()
    assert(spans <= 16, s"64-element z-order runs must stay in a 16x16 tile, got span $spans")
  }
}
