package graft.sources

import graft.SparkSpec

class TablesSpec extends SparkSpec {

  test("events materializes as TimestampType regardless of footer shape") {
    // Tables.read scopes spark.sql.legacy.parquet.nanosAsLong to schema
    // inference and restores the previous value before any action (only
    // needed for the TIMESTAMP(NANOS) footer generation; harmless for the
    // MICROS/NTZ footer the current generator writes). Whatever the footer
    // says — NANOS (→ LongType → timestamp_micros) or
    // isAdjustedToUTC=false MICROS (→ TimestampNTZType → cast) — the
    // loader must hand every operator a plain µs TimestampType `ts`.
    // getOption returns the registered default ("false") even when unset —
    // assert the EFFECTIVE value is off, i.e. the scoped "true" never leaks
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") !== "true")
    val events = Tables(spark, sf, "events")
    assert(spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") !== "true")
    val n = events.count() // full scan — exercises the execution-time path
    assert(n > 0)
    assert(events.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    assert(events.select("ts").na.drop().count() === n)
  }

  test("NTZ footer normalization is value-identity under the UTC session") {
    // Write an NTZ parquet ourselves (independent of what the driver's
    // generator currently emits) and load it through the Tables seam: the
    // micros under the timestamp must be unchanged by the NTZ→instant cast.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("ntz_events").toString
    spark.range(5).select(
      col("id").as("event_id"),
      timestamp_micros(lit(1700000000000000L) + col("id") * 1000000L)
        .cast(org.apache.spark.sql.types.TimestampNTZType).as("ts"),
      col("id").as("user_id"), lit("edit").as("event_type"),
      lit(1.0).as("value"), lit("{}").as("props")
    ).coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables(spark, dir, "events")
    assert(loaded.schema("ts").dataType ===
      org.apache.spark.sql.types.TimestampType)
    val micros = loaded.select(unix_micros(col("ts"))).as[Long](
      org.apache.spark.sql.Encoders.scalaLong).collect().sorted
    assert(micros === Array.tabulate(5)(i => 1700000000000000L + i * 1000000L))
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
