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

  test("a session-wide nanosAsLong=false survives loading events") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    try {
      val events = Tables(spark, sf, "events")
      assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") === "false")
      assert(events.count() > 0)
    } finally spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
  }
}
