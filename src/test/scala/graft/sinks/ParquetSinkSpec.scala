package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ParquetSinkSpec extends SparkSpec {
  import spark.implicits._

  test("time-partitioned sorted layout prunes by date partition") {
    val dir = Files.createTempDirectory("psink").toString + "/t"
    val df = spark.range(0, 100).select(
      timestamp_seconds(lit(1700000000L) + $"id" * 86400).as("ts"),
      $"id".as("v"))
    ParquetSink.appendTimePartitioned(df, dir, "ts")
    val back = spark.read.parquet(dir)
    assert(back.count() === 100)
    // partition column materialized → date filter prunes directories
    val one = back.filter($"__event_date" === "2023-11-20")
    assert(one.count() === 1)
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || back.columns.contains("__event_date"))
  }

  test("co-bucketed tables join without a shuffle exchange") {
    val o = graft.sources.Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_totalprice")
    val l = graft.sources.Tables(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    ParquetSink.writeBucketed(o, "b_orders", "o_orderkey", 4)
    ParquetSink.writeBucketed(l, "b_lineitem", "l_orderkey", 4)
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"),
        $"o_orderkey" === $"l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    // bucket layout satisfies the join's distribution: no hash exchange
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(800))
    assert(joined.count() === l.count())
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }

  test("bucket-count mismatch reintroduces the exchange the matched " +
      "layout removes — q212's zero-exchange assertion is not vacuous") {
    val o = graft.sources.Tables(spark, sf, "orders")
      .select($"o_orderkey", $"o_totalprice")
    val l = graft.sources.Tables(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_quantity")
    ParquetSink.writeBucketed(o, "mm_orders", "o_orderkey", 8)
    ParquetSink.writeBucketed(l, "mm_lineitem", "l_orderkey", 4)
    val joined = spark.table("mm_orders").hint("merge")
      .join(spark.table("mm_lineitem"), $"o_orderkey" === $"l_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning"), plan.take(800))
    assert(joined.count() === l.count())
    spark.sql("DROP TABLE IF EXISTS mm_orders")
    spark.sql("DROP TABLE IF EXISTS mm_lineitem")
  }

  test("partition-drop retention removes only pre-cutoff dates") {
    val dir = Files.createTempDirectory("pdrop").toString + "/t"
    val df = spark.range(0, 10).select(
      timestamp_seconds(lit(1700000000L) + $"id" * 86400).as("ts"),
      $"id".as("v"))
    ParquetSink.appendTimePartitioned(df, dir, "ts")
    // day 0 = 2023-11-14; cutoff keeps the last 4 days (ids 6..9)
    val dropped = ParquetSink.dropPartitionsBefore(spark, dir,
      java.time.LocalDate.parse("2023-11-20"))
    assert(dropped.size === 6)
    assert(dropped.head === "2023-11-14")
    val back = spark.read.parquet(dir)
    assert(back.count() === 4)
    assert(back.agg(min($"v")).head().getLong(0) === 6L)
    // idempotent: nothing left to drop
    assert(ParquetSink.dropPartitionsBefore(spark, dir,
      java.time.LocalDate.parse("2023-11-20")).isEmpty)
  }

  test("appendSorted writes readable sorted parquet") {
    val dir = Files.createTempDirectory("psort").toString + "/t"
    val df = spark.range(0, 50).select(($"id" * 7 % 50).as("k"), $"id".as("v"))
    ParquetSink.appendSorted(df, dir, Seq("k"))
    assert(spark.read.parquet(dir).count() === 50)
  }
}
