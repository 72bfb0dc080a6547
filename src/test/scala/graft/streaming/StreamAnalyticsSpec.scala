package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

class StreamAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("tumbling windows aggregate a memory stream with watermark (append)") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String, Double)]
    val df = src.toDF().toDF("ts", "event_type", "value")
    val agg = StreamAnalytics.tumblingCounts(
      StreamAnalytics.withLateDataDropped(df, "ts", "10 minutes"),
      "ts", "1 hour", Seq("event_type"))
    val q = agg.writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    try {
      src.addData(
        (ts("2024-01-01 10:05:00"), "view", 1.0),
        (ts("2024-01-01 10:45:00"), "view", 2.0),
        (ts("2024-01-01 11:05:00"), "click", 3.0))
      q.processAllAvailable()
      // advance watermark far enough to close the 10:00 and 11:00 windows
      src.addData((ts("2024-01-01 14:00:00"), "view", 0.0))
      q.processAllAvailable()
      val out = spark.table("tumbling")
        .select(date_format($"window.start", "HH:mm").as("w"),
          $"event_type", $"n_events", $"sum_value")
        .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
          r.getDouble(3))).toSet
      assert(out.contains(("10:00", "view", 2L, 3.0)))
      assert(out.contains(("11:00", "click", 1L, 3.0)))
    } finally q.stop()
  }

  test("late row behind the watermark is dropped from the aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Timestamp, String, Double)]
    val df = src.toDF().toDF("ts", "event_type", "value")
    val agg = StreamAnalytics.tumblingCounts(
      StreamAnalytics.withLateDataDropped(df, "ts", "5 minutes"),
      "ts", "1 hour")
    val q = agg.writeStream.format("memory").queryName("late")
      .outputMode("append").start()
    try {
      src.addData((ts("2024-01-01 10:30:00"), "view", 1.0))
      q.processAllAvailable()
      src.addData((ts("2024-01-01 13:00:00"), "view", 1.0)) // watermark → 12:55
      q.processAllAvailable()
      src.addData((ts("2024-01-01 10:31:00"), "view", 99.0)) // too late
      q.processAllAvailable()
      src.addData((ts("2024-01-01 16:00:00"), "view", 1.0)) // close all
      q.processAllAvailable()
      val hour10 = spark.table("late")
        .filter(date_format($"window.start", "HH") === "10").head()
      assert(hour10.getAs[Long]("n_events") === 1L) // late row excluded
    } finally q.stop()
  }

  test("session windows merge events within the gap (batch semantics)") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 1.0), // same session (gap < 30m)
      (1L, ts("2024-01-01 11:30:00"), 1.0), // new session
      (2L, ts("2024-01-01 10:00:00"), 1.0)
    ).toDF("user_id", "ts", "value")
    val out = StreamAnalytics.sessionWindows(df, "ts", "user_id", "30 minutes")
      .select($"user_id", $"n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toList.sorted
    assert(out === List((1L, 1L), (1L, 2L), (2L, 1L)))
  }

  test("stream-stream interval join matches pairs within the delay bound") {
    implicit val sqlCtx = spark.sqlContext
    val viewsSrc = MemoryStream[(Long, Long, Timestamp)]
    val purchSrc = MemoryStream[(Long, Long, Timestamp)]
    val views = StreamAnalytics.withLateDataDropped(
      viewsSrc.toDF().toDF("view_id", "user_id", "view_ts"), "view_ts",
      "10 minutes")
    val purchases = StreamAnalytics.withLateDataDropped(
      purchSrc.toDF().toDF("purchase_id", "p_user", "purchase_ts"),
      "purchase_ts", "10 minutes")
    val joined = StreamAnalytics.intervalJoin(
        views, "user_id", "view_ts",
        purchases, "p_user", "purchase_ts", "1 HOUR")
      .select($"view_id", $"purchase_id")
    val q = joined.writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    try {
      viewsSrc.addData((1L, 7L, ts("2024-01-01 10:00:00")),
        (2L, 7L, ts("2024-01-01 12:00:00")),
        (3L, 8L, ts("2024-01-01 10:00:00")))
      purchSrc.addData(
        (101L, 7L, ts("2024-01-01 10:30:00")), // within 1h of view 1
        (102L, 7L, ts("2024-01-01 11:30:00")), // >1h after view 1, <12:00
        (103L, 9L, ts("2024-01-01 10:30:00"))) // no matching user
      q.processAllAvailable()
      val out = spark.table("attrib").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(out === Set((1L, 101L)))
    } finally q.stop()
  }

  test("sliding windows count each event in overlapping frames") {
    val df = Seq((ts("2024-01-01 10:15:00"), "a", 1.0))
      .toDF("ts", "event_type", "value")
    val n = StreamAnalytics.slidingCounts(df, "ts", "1 hour", "30 minutes")
      .count()
    assert(n === 2) // event falls into 09:30-10:30 and 10:00-11:00
  }

  test("stream-static enrichment keeps unmatched events with null dims") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[(Long, Double)]
    val stream = src.toDF().toDF("user_id", "value")
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val q = StreamAnalytics.enrichWithStatic(stream, dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      src.addData((1L, 10.0), (3L, 30.0))
      q.processAllAvailable()
      src.addData((2L, 20.0)) // second micro-batch re-plans the static side
      q.processAllAvailable()
      val out = spark.table("enriched").select("user_id", "tier")
        .collect().map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      assert(out === Set((1L, Some("gold")), (3L, None),
        (2L, Some("silver"))))
    } finally q.stop()
  }
}
