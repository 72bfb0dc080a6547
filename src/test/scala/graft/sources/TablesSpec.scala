package graft.sources

import graft.SparkSpec

class TablesSpec extends SparkSpec {

  test("events (TIMESTAMP(NANOS) parquet) materializes after conf restore") {
    // Tables.read scopes spark.sql.legacy.parquet.nanosAsLong to schema
    // inference and restores the previous value before any action. This
    // pins the load-bearing assumption documented in Tables.read: at
    // EXECUTION time the reader accepts INT64(NANOS) against the pinned
    // LongType schema with the conf unset. If a Spark upgrade re-consults
    // the conf at execution, this test fails before production does.
    // getOption returns the registered default ("false") even when unset —
    // assert the EFFECTIVE value is off, i.e. the scoped "true" never leaks
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") !== "true")
    val events = Tables(spark, sf, "events")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") !== "true")
    val n = events.count() // full scan — exercises the execution-time path
    assert(n > 0)
    // the ns column arrives as a proper µs TimestampType after the loader
    assert(events.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(events.select("ts").na.drop().count() === n)
  }

  test("sqlOverViews isolates concurrent invocations and drops its views") {
    import spark.implicits._
    val a = Seq(1, 2, 3).toDF("x")
    val b = Seq(10, 20).toDF("x")
    // the frame returned from inside the block must survive the view drop
    // (sql() analyzes eagerly) and see ONLY its own registration
    val ra = Tables.sqlOverViews(spark, "t" -> a) { v =>
      s"SELECT SUM(x) AS s FROM ${v("t")}"
    }
    val rb = Tables.sqlOverViews(spark, "t" -> b) { v =>
      s"SELECT SUM(x) AS s FROM ${v("t")}"
    }
    assert(ra.head().getLong(0) === 6L)
    assert(rb.head().getLong(0) === 30L)
    // no leaked temp views from either invocation
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("t_")))
  }

  test("a session-wide nanosAsLong=false survives loading events") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try {
      val events = Tables(spark, sf, "events")
      assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "false")
      assert(events.count() > 0)
    } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }
}
