package graft.sources.sse

import java.nio.file.{Files, Paths, StandardOpenOption}

import graft.SparkSpec

class SseFileStreamSpec extends SparkSpec {
  import spark.implicits._

  private def append(path: String, lines: String*): Unit =
    Files.write(Paths.get(path), (lines.mkString("\n") + "\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  test("sse-file micro-batch source tails complete frames transactionally") {
    val file = Files.createTempDirectory("ssecap").toString + "/capture.sse"
    append(file, "event: message", "data: {\"n\":1}", "")
    val q = spark.readStream.format("sse-file").load(file)
      .writeStream.format("memory").queryName("sse_tail")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sse_tail").count() === 1)
      // a half-written frame must NOT be consumed...
      append(file, "event: message", "data: {\"n\":2}")
      q.processAllAvailable()
      assert(spark.table("sse_tail").count() === 1)
      // ...until its terminator arrives, plus one more full frame
      append(file, "", "data: {\"n\":3}", "")
      q.processAllAvailable()
      val rows = spark.table("sse_tail").select("data").as[String]
        .collect().toSet
      assert(rows === Set("{\"n\":1}", "{\"n\":2}", "{\"n\":3}"))
    } finally q.stop()
  }

  test("sse-file source feeds the full wiki pipeline") {
    val file = Files.createTempDirectory("ssewiki").toString + "/capture.sse"
    val json = scala.io.Source
      .fromFile(fixturePath("recentchange_fixture.jsonl")).getLines().toSeq
    json.foreach(j => append(file, "event: message", s"data: $j", ""))
    val raw = spark.readStream.format("sse-file").load(file)
      .filter($"event" === "message").select($"data".as("value"))
    val out = graft.streaming.WikiStream.fromRawLines(raw)
    val q = out.writeStream.format("memory").queryName("sse_wiki")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("sse_wiki").count() === 3)
    } finally q.stop()
  }
}
