package graft.sources

import graft.SparkSpec

class SseFramesSpec extends SparkSpec {
  import spark.implicits._

  test("parses frames, joins multi-line data, skips comments/heartbeats") {
    val lines = Seq(
      ": heartbeat", // comment, ignored
      "event: message",
      "id: 123",
      "data: {\"a\":1,", // multi-line data
      "data: \"b\":2}",
      "",
      "event: error", // non-message frame
      "data: oops",
      "",
      "data: {\"c\":3}", // default event type = message
      "",
      "data:", // empty data → frame dropped
      "",
      "data: {\"tail\":true}" // open frame at partition end → emitted
    ).toDS().coalesce(1)
    val events = SseFrames.parse(lines).collect()
    assert(events.length === 4)
    assert(events(0) === SseFrames.SseEvent("message", "{\"a\":1,\n\"b\":2}", "123"))
    assert(events(1).event === "error")
    assert(events(2) === SseFrames.SseEvent("message", "{\"c\":3}", "123")) // id persists per SSE spec
    assert(events(3).data === "{\"tail\":true}")
  }

  test("CRLF-terminated frames parse identically to LF frames") {
    val lf = Seq("event: message", "data: x", "", "data: y", "")
    val crlf = lf.map(l => if (l.isEmpty) "\r" else l + "\r")
    val a = SseFrames.frameIterator(lf.iterator).toVector
    val b = SseFrames.frameIterator(crlf.iterator).toVector
    assert(a === b)
    assert(a.map(_.data) === Vector("x", "y"))
  }

  test("messageData keeps only non-empty message frames (F1)") {
    val lines = Seq(
      "event: message", "data: keep1", "",
      "event: error", "data: drop", "",
      "data: keep2", ""
    ).toDS().coalesce(1)
    val out = SseFrames.messageData(SseFrames.parse(lines))
      .as[String].collect().toSet
    assert(out === Set("keep1", "keep2"))
  }

  test("sse → wiki pipeline end to end") {
    val jsonLines = scala.io.Source
      .fromFile(fixturePath("recentchange_fixture.jsonl")).getLines().toSeq
    // wrap each JSON line in an SSE frame
    val sse = jsonLines.flatMap(j => Seq("event: message", s"data: $j", ""))
    val events = SseFrames.messageData(SseFrames.parse(sse.toDS().coalesce(1)))
    val out = graft.ingest.WikiIngest.pipeline(events)
    assert(out.count() === 3)
  }
}
