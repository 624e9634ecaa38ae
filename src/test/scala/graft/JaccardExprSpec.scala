package graft

import org.apache.spark.sql.functions._
import graft.functions.{GraftFunctions, SortedArrayJaccard}

/** Native sorted-merge Jaccard: parity with the declarative
  * intersect/union form, SQL registration, and precondition enforcement. */
class JaccardExprSpec extends SparkSpec {
  import spark.implicits._

  test("native expression matches size(intersect)/size(union) over 10k random pairs") {
    val df = spark.range(10000).select(
      expr("array_sort(array_distinct(transform(sequence(1, 1 + CAST(pmod(xxhash64(id), 20) AS INT)), " +
        "i -> CAST(pmod(xxhash64(id, i), 30) AS STRING))))").as("a"),
      expr("array_sort(array_distinct(transform(sequence(1, 1 + CAST(pmod(xxhash64(id, 99), 20) AS INT)), " +
        "i -> CAST(pmod(xxhash64(id, i + 1000), 30) AS STRING))))").as("b"))
    val mismatches = df.select(
        GraftFunctions.jaccard(col("a"), col("b")).as("native"),
        (size(array_intersect(col("a"), col("b"))).cast("double")
          / size(array_union(col("a"), col("b")))).as("decl"))
      .filter(col("native") =!= col("decl")).count()
    assert(mismatches === 0)
  }

  test("graft_jaccard is SQL-callable after register()") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT graft_jaccard(array('a','b','c'), array('b','c','d')) AS j")
      .as[Double].head()
    assert(r === 0.5)
  }

  test("edge cases: disjoint, identical, empty") {
    assert(SortedArrayJaccard.compute(
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any]),
      new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])) === 0.0)
    val j = Seq((Seq("a", "b"), Seq("a", "b")), (Seq("a"), Seq("b")))
      .toDF("a", "b")
      .select(GraftFunctions.jaccard(col("a"), col("b")))
      .as[Double].collect()
    assert(j.toSeq === Seq(1.0, 0.0))
  }

  test("unsorted input fails loudly instead of undercounting silently") {
    val ex = intercept[Exception] {
      Seq((Seq("c", "a", "b"), Seq("a", "b", "c"))).toDF("a", "b")
        .select(GraftFunctions.jaccard(col("a"), col("b")))
        .collect()
    }
    assert(ex.getMessage.contains("SORTED") ||
      ex.getCause != null && ex.getCause.getMessage.contains("SORTED"))
  }

  test("sorted-but-non-distinct input fails loudly instead of inflating") {
    // duplicates inflate na+nb (and can double-count intersections), so
    // a sorted-with-dupes array passing silently would be a wrong answer
    val ex = intercept[Exception] {
      Seq((Seq("a", "b", "b"), Seq("a", "b", "c"))).toDF("a", "b")
        .select(GraftFunctions.jaccard(col("a"), col("b")))
        .collect()
    }
    assert(ex.getMessage.contains("DISTINCT") ||
      ex.getCause != null && ex.getCause.getMessage.contains("DISTINCT"))
  }

  test("null array elements fail loudly instead of NPE") {
    // graft_jaccard is a registered SQL function — arbitrary user arrays
    // (containsNull=true) reach this path
    GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_jaccard(array('a', NULL), array('a','b')) AS j")
        .collect()
    }
    assert(ex.getMessage.contains("non-null") ||
      ex.getCause != null && ex.getCause.getMessage.contains("non-null"))
  }
}
