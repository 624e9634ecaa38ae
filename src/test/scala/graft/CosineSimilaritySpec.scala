package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.operators.Similarity

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = {
    val rnd = new scala.util.Random(3)
    (0L until 50L).map(id => (id, Seq.fill(64)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
  }

  test("native expression is bit-identical to the declarative fold") {
    val pairs = vecs.select(col("vec_id").as("a_id"), col("embedding").as("a"))
      .crossJoin(vecs.select(col("vec_id").as("b_id"), col("embedding").as("b")))
      .limit(500)
    val diff = pairs.select(
      Similarity.cosine(col("a"), col("b")).as("native"),
      Similarity.cosineDeclarative(col("a"), col("b")).as("decl"))
      .filter(col("native") =!= col("decl")) // exact, not approximate
      .count()
    assert(diff === 0)
  }

  test("known values") {
    val df = Seq(
      (Seq(1f, 0f), Seq(0f, 1f), 0.0),
      (Seq(1f, 0f), Seq(1f, 0f), 1.0),
      (Seq(1f, 2f), Seq(-1f, -2f), -1.0)).toDF("a", "b", "expected")
    val bad = df.filter(abs(GraftFunctions.cosine(col("a"), col("b")) - col("expected")) > 1e-12)
    assert(bad.count() === 0)
  }

  test("null element and length mismatch yield null") {
    val df = Seq((Seq(Some(1f), None), Seq(Some(1f), Some(2f)))).toDF("a", "b")
    assert(df.select(GraftFunctions.cosine(col("a"), col("b"))).head().isNullAt(0))
    val df2 = Seq((Seq(1f, 2f), Seq(1f, 2f, 3f))).toDF("a", "b")
    assert(df2.select(GraftFunctions.cosine(col("a"), col("b"))).head().isNullAt(0))
  }

  test("SQL registration via register() and via extensions class") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .as[Double].head()
    assert(r === 1.0)
  }

  test("codegen path actually compiles (no fallback to interpreted)") {
    // force a wide plan through codegen; any doGenCode error surfaces here
    val out = vecs.select(Similarity.cosine(col("embedding"), col("embedding")).as("c"))
    assert(out.filter(abs(col("c") - 1.0) < 1e-9).count() === 50)
  }
}
