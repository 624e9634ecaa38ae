package graft

class GraftFacadeSpec extends SparkSpec {

  test("registerTables mounts every table; SQL sees them with usable types") {
    Graft.registerTables(spark, "/root/testdata/sf0.001")
    for (t <- Graft.Tables)
      assert(spark.sql(s"SELECT * FROM $t LIMIT 1").count() === 1, t)
    // events ts arrives as a genuine timestamp, nanos quirk hidden
    assert(spark.sql("SELECT date_trunc('hour', ts) FROM events LIMIT 1").count() === 1)
    // graft's native SQL functions resolve through the same session
    val cos = spark.sql(
      """SELECT graft_cosine(embedding, embedding) AS c FROM embeddings LIMIT 5""")
      .collect().map(_.getDouble(0))
    assert(cos.forall(c => math.abs(c - 1.0) < 1e-6))
  }

  test("query() dispatches by inventory key; queryNames covers oracleSql") {
    assert(Graft.query(spark, "lineitem_agg", "/root/testdata/sf0.001").count() > 0)
    assert(SparkEntry.oracleSql.keySet.subsetOf(Graft.queryNames.toSet))
  }
}
