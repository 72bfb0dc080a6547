package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.sinks.{IncrementalAgg, ManifestSink}

class StreamingViewSpec extends SparkSpec {
  import spark.implicits._

  test("streaming view equals the batch aggregate; replays don't double-count") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("sview").toString
    val viewDir = s"$root/view"
    val src = MemoryStream[(Long, String, Double)]
    val df = src.toDF().toDF("event_id", "event_type", "value")
    val q = df.writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, id: Long) =>
        StreamingView.maintainView(b, id, viewDir, Seq("event_type"), "value")
      }
      .start()
    val all = Seq(
      (1L, "view", 1.5), (2L, "click", 2.0), (3L, "view", 0.25),
      (4L, "purchase", 9.0), (5L, "view", 4.0), (6L, "click", 1.0))
    try {
      src.addData(all.take(3): _*)
      q.processAllAvailable()
      src.addData(all.drop(3): _*)
      q.processAllAvailable()
    } finally q.stop()
    def rows(d: DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    val viaStream = rows(
      StreamingView.readView(spark, viewDir, Seq("event_type")))
    val direct = rows(IncrementalAgg.present(IncrementalAgg.aggregate(
      all.toDF("event_id", "event_type", "value"),
      Seq("event_type"), "value"), Seq("event_type")))
    assert(viaStream === direct && viaStream.size === 3)
    // at-least-once replay: refolding an already-committed epoch (same
    // batchId, same data — how foreachBatch retries present themselves)
    // must be a no-op, not a double count
    val vBefore = ManifestSink.version(spark, viewDir)
    val lastId = ManifestSink.read(spark, viewDir)
      .agg(org.apache.spark.sql.functions.max($"__batch_id"))
      .head().getLong(0)
    StreamingView.maintainView(
      all.drop(3).toDF("event_id", "event_type", "value"),
      lastId, viewDir, Seq("event_type"), "value")
    assert(ManifestSink.version(spark, viewDir) === vBefore) // no commit
    assert(rows(StreamingView.readView(
      spark, viewDir, Seq("event_type"))) === direct)
    // a genuinely new epoch still folds
    StreamingView.maintainView(
      Seq((7L, "view", 10.0)).toDF("event_id", "event_type", "value"),
      lastId + 1, viewDir, Seq("event_type"), "value")
    val after = StreamingView.readView(spark, viewDir, Seq("event_type"))
      .filter($"event_type" === "view").head()
    assert(after.getAs[Long]("n") === 4L)
    assert(after.getAs[Double]("sum_value") === 15.75)
  }

  test("streaming distinct-count view: cross-batch repeat users never " +
      "double-count; replays are no-ops") {
    import graft.functions.PortableHash
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("sdview").toString
    val viewDir = s"$root/view"
    val k = 16
    val h = PortableHash.tokenHashP($"user_id")
    val src = MemoryStream[(String, String)]
    val q = src.toDF().toDF("event_type", "user_id").writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, id: Long) =>
        StreamingView.maintainDistinctView(
          b, id, viewDir, Seq("event_type"), h, k)
      }
      .start()
    try {
      src.addData(("view", "u1"), ("view", "u2"), ("click", "u1"))
      q.processAllAvailable()
      // batch 2 repeats u2 for "view" (cross-batch dup) and adds u3
      src.addData(("view", "u2"), ("view", "u3"), ("click", "u9"))
      q.processAllAvailable()
    } finally q.stop()
    val view = StreamingView.readDistinctView(
        spark, viewDir, Seq("event_type"), k, PortableHash.P)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(view === Map("view" -> 3.0, "click" -> 2.0))
    // replay of the last epoch is a no-op
    val vBefore = ManifestSink.version(spark, viewDir)
    val lastId = ManifestSink.read(spark, viewDir)
      .agg(org.apache.spark.sql.functions.max($"__batch_id"))
      .head().getLong(0)
    StreamingView.maintainDistinctView(
      Seq(("view", "u2"), ("view", "u3"), ("click", "u9"))
        .toDF("event_type", "user_id"),
      lastId, viewDir, Seq("event_type"), h, k)
    assert(ManifestSink.version(spark, viewDir) === vBefore)
  }

  test("streaming quantile view equals the batch sample estimator " +
      "over the full history") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("sqview").toString
    val viewDir = s"$root/view"
    val k = 8
    val all = (1 to 60).map(i =>
      (i.toLong, if (i % 2 == 0) "a" else "b", i * 0.5))
    val src = MemoryStream[(Long, String, Double)]
    val q = src.toDF().toDF("id", "g", "v").writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, bid: Long) =>
        StreamingView.maintainQuantileView(
          b, bid, viewDir, "g", "id", "v", k)
      }
      .start()
    try {
      src.addData(all.take(25): _*)
      q.processAllAvailable()
      src.addData(all.drop(25): _*)
      q.processAllAvailable()
    } finally q.stop()
    def rows(d: DataFrame) = d.collect().map(_.toString).sorted.toSeq
    // the streamed view == the batch estimator over the whole history
    // (the folded sample is bit-identical to the from-scratch sample)
    val direct = rows(graft.sinks.IncrementalQuantiles.present(
      graft.sinks.IncrementalQuantiles.sampleState(
        all.toDF("id", "g", "v"), "g", "id", "v", k), "g"))
    assert(rows(StreamingView.readQuantileView(spark, viewDir, "g"))
      === direct)
  }

  test("streaming leaderboard view: top-k per group off maintained state, " +
      "cross-batch sums rank correctly") {
    implicit val sqlCtx = spark.sqlContext
    val root = Files.createTempDirectory("stopk").toString
    val viewDir = s"$root/view"
    // (event_type, user_id, value): user 3's total only wins its group
    // once BOTH batches fold — a per-batch top-k would rank it wrong
    val batch1 = Seq(("a", 1L, 5.0), ("a", 2L, 4.0), ("a", 3L, 3.0),
      ("b", 7L, 1.0), ("b", 8L, 2.0))
    val batch2 = Seq(("a", 3L, 9.0), ("a", 1L, 0.5), ("b", 7L, 4.0))
    val src = MemoryStream[(String, Long, Double)]
    val q = src.toDF().toDF("event_type", "user_id", "value").writeStream
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (b: DataFrame, bid: Long) =>
        StreamingView.maintainView(
          b, bid, viewDir, Seq("event_type", "user_id"), "value")
      }
      .start()
    try {
      src.addData(batch1: _*)
      q.processAllAvailable()
      src.addData(batch2: _*)
      q.processAllAvailable()
    } finally q.stop()
    val top = StreamingView.readTopKView(
        spark, viewDir, Seq("event_type"), Seq("user_id"), 2)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(4)))
      .toSet
    // group a: user 3 total 12.0 ranks 1, user 1 total 5.5 ranks 2
    // group b: user 7 total 5.0 ranks 1, user 8 total 2.0 ranks 2
    assert(top === Set(("a", 3L, 1L, 12.0), ("a", 1L, 2L, 5.5),
      ("b", 7L, 1L, 5.0), ("b", 8L, 2L, 2.0)))
    // == the batch leaderboard over the full history
    def rows(d: DataFrame) = d.collect().map(_.toString).sorted.toSeq
    val all = batch1 ++ batch2
    val direct = rows(IncrementalAgg.presentTopK(
      IncrementalAgg.aggregate(all.toDF("event_type", "user_id", "value"),
        Seq("event_type", "user_id"), "value"),
      Seq("event_type"), Seq("user_id"), 2))
    assert(rows(StreamingView.readTopKView(
      spark, viewDir, Seq("event_type"), Seq("user_id"), 2)) === direct)
  }
}
