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

  test("shingle_array and minhash_bands are callable from SQL") {
    GraftFunctions.register(spark)
    GraftFunctions.registerTables(spark, sf)
    // SQL kernel output equals the DataFrame-API kernel output
    val r = spark.sql(
      """SELECT doc_id,
        |  shingle_array(split(text, ' '), 2) AS sh,
        |  minhash_bands(split(text, ' '), 16, 4) AS mb
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length === 5)
    r.foreach { row =>
      assert(row.getSeq[String](1).nonEmpty)
      assert(row.getSeq[Long](2).length === 4)
    }
    val viaApi = graft.sources.Tables(spark, sf, "documents")
      .orderBy("doc_id").limit(5)
      .select(graft.streaming.StreamingDedup.bandHashes(
        org.apache.spark.sql.functions.col("text")).as("mb"))
      .collect().map(_.getSeq[Long](0))
    assert(r.map(_.getSeq[Long](2)).toSeq === viaApi.toSeq)
    // structural params must be literals, same contract as kmv_sketch
    val err = intercept[Exception] {
      spark.sql("SELECT minhash_bands(split(text, ' '), doc_id, 4) " +
        "FROM documents").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(
      _.contains("numHashes must be a positive integer literal")))
  }

  test("kmv_sketch k: accepts BIGINT/cast literals, rejects columns clearly") {
    GraftFunctions.register(spark)
    GraftFunctions.registerTables(spark, sf)
    // a cast integral literal folds to the same sketch
    val r = spark.sql(
      """SELECT sk.n_sketch AS n FROM (
        |  SELECT kmv_sketch(vec_id, CAST(16 AS BIGINT)) AS sk
        |  FROM embeddings)""".stripMargin).head()
    assert(r.getLong(0) === 16L)
    // a non-literal k is an analysis-time error with a readable message,
    // not a ClassCastException out of eval()
    val err = intercept[Exception] {
      spark.sql("SELECT kmv_sketch(vec_id, vec_id) FROM embeddings").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("k must be a positive integer literal")))
  }

  test("typed LengthChurn aggregator over Dataset[WikiEvent.Row]") {
    import spark.implicits._
    import java.sql.Timestamp
    def row(user: String, diff: Long) = graft.model.WikiEvent.Row(
      "{}", Timestamp.valueOf("2026-01-08 22:35:51"), "T", "u",
      bot = false, user, 0L, diff, diff)
    val ds = Seq(row("a", 100), row("a", -50), row("b", 0)).toDS()
    val out = ds.groupByKey(_.username)
      .agg(TypedAggs.LengthChurn.toColumn.name("churn"))
      .collect().toMap
    assert(out("a") === 75.0) // (|100| + |-50|) / 2
    assert(out("b") === 0.0)
  }

  test("registered views cover every table") {
    GraftFunctions.registerTables(spark, sf)
    graft.sources.Tables.all.foreach { t =>
      assert(spark.table(t).columns.nonEmpty, t)
    }
  }
}
