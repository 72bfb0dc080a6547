package graft.functions

import graft.SparkSpec

class GraftFunctionsSpec extends SparkSpec {

  test("seq_dot is callable from SQL after registration") {
    GraftFunctions.register(spark)
    GraftFunctions.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT vec_id, seq_dot(embedding, embedding) AS d
        |FROM embeddings ORDER BY vec_id LIMIT 3""".stripMargin)
      .collect()
    assert(r.length === 3)
    // embeddings are L2-normalized → self-dot ≈ 1
    r.foreach(row => assert(math.abs(row.getDouble(1) - 1.0) < 1e-5))
  }

  test("kmv_sketch is callable from SQL after registration") {
    GraftFunctions.register(spark)
    GraftFunctions.registerTables(spark, sf)
    val r = spark.sql(
      """SELECT sk.n_sketch AS n, sk.kth AS kth FROM (
        |  SELECT kmv_sketch(vec_id, 16) AS sk FROM embeddings)""".stripMargin)
      .head()
    assert(r.getLong(0) === 16L)
    assert(r.getLong(1) === 15L) // vec_ids 0..499 → 16 smallest end at 15
  }

  test("registered views cover every table") {
    GraftFunctions.registerTables(spark, sf)
    graft.sources.Tables.all.foreach { t =>
      assert(spark.table(t).columns.nonEmpty, t)
    }
  }
}
