package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sinks.ManifestSink
import graft.sources.Tables

class SinkOpsSpec extends SparkSpec {
  import spark.implicits._

  test("q88 equals the direct filter and its scan really prunes") {
    // equality vs computing the same aggregate without the sink
    val viaSink = SinkOps.queries("q88_manifest_roundtrip")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    val ev = Tables(spark, sf, "events")
      .select($"event_id", $"event_type", $"value")
    val maxId = ev.agg(max($"event_id")).head().getLong(0)
    val (cut1, cut2) = (maxId / 3, 2 * maxId / 3)
    val direct = ev
      .filter($"event_id" > cut1 && $"event_id" <= cut2)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        graft.functions.Exact.dsum($"value").as("s"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    assert(viaSink === direct)
    // skipping: rebuild the same layout and check the mid-range scan
    // touches exactly 1 of the 3 entries
    val sink = java.nio.file.Files
      .createTempDirectory("sinkops_").toString + "/t"
    ManifestSink.appendWithStats(
      ev.filter($"event_id" <= cut1), sink, Seq("event_id"))
    ManifestSink.appendWithStats(
      ev.filter($"event_id" > cut1 && $"event_id" <= cut2), sink,
      Seq("event_id"))
    ManifestSink.appendWithStats(
      ev.filter($"event_id" > cut2), sink, Seq("event_id"))
    val (kept, skipped) = ManifestSink.prunedEntries(
      spark, sink, "event_id", Some(cut1 + 1), Some(cut2))
    assert(kept.size === 1 && skipped.size === 2)
  }
}
