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

  test("incremental advance parses only the appended tail") {
    import SseFileStreamProvider._
    val file = Files.createTempDirectory("sseadv").toString + "/cap.sse"
    append(file, "id: a1", "data: one", "")
    val s1 = SseFileStreamProvider.advance(file, InitialState)
    assert(s1.frames === 1L)
    assert(s1.stickyId === "a1")
    assert(s1.bytes === Files.size(Paths.get(file)))
    // appended frames advance from the cached state, not from byte 0
    append(file, "data: two", "", ": heartbeat", "data: three", "")
    val s2 = SseFileStreamProvider.advance(file, s1)
    assert(s2.frames === 3L)
    assert(s2.stickyId === "a1") // sticky id carries across frames
    // resuming mid-file yields the same events as a full parse
    val resumed = SseFileStreamProvider.framesFrom(file, s1).toVector
    assert(resumed.map(_.data) === Vector("two", "three"))
    assert(resumed.map(_.id) === Vector("a1", "a1"))
    val full = SseFileStreamProvider.completeFrames(file).toVector
    assert(full.drop(1) === resumed)
  }

  test("partition reader releases its file descriptor when quota-bounded") {
    import SseFileStreamProvider._
    val file = Files.createTempDirectory("ssefd").toString + "/cap.sse"
    // many frames so a quota-bounded reader stops WELL before the byte
    // limit — the pre-fix leak path (channel closed only at EOF/limit)
    (1 to 50).foreach(i => append(file, s"data: f$i", ""))
    def openFds(): Set[String] = {
      val d = new java.io.File("/proc/self/fd")
      Option(d.list()).map(_.toSet).getOrElse(Set.empty)
    }
    val stream = new SseFileMicroBatchStream(file, Long.MaxValue)
    val parts = stream.planInputPartitions(SseFrameOffset(0), SseFrameOffset(2))
    val before = openFds()
    (1 to 20).foreach { _ =>
      val r = stream.createReaderFactory().createReader(parts(0))
      assert(r.next()) // consume 1 of 2 frames, then abandon mid-quota
      r.close()
    }
    val leaked = (openFds() -- before).size
    assert(leaked === 0, s"$leaked descriptors leaked by closed readers")
    // close() after exhaustion is also safe (idempotent)
    val r2 = stream.createReaderFactory().createReader(parts(0))
    while (r2.next()) ()
    r2.close(); r2.close()
  }

  test("maxBytesPerTrigger caps the bytes admitted per advance") {
    import SseFileStreamProvider._
    val file = Files.createTempDirectory("ssecapn").toString + "/cap.sse"
    append(file, "data: one", "") // 11 bytes
    append(file, "data: two", "")
    val s1 = SseFileStreamProvider.advance(file, InitialState, maxBytes = 15L)
    assert(s1.frames === 1L) // second frame does not fit in the window
    val s2 = SseFileStreamProvider.advance(file, s1, maxBytes = 15L)
    assert(s2.frames === 2L) // admitted on the next trigger
  }

  test("open frame at the byte cap stays unconsumed (no partial frames)") {
    import SseFileStreamProvider._
    val file = Files.createTempDirectory("ssepart").toString + "/cap.sse"
    append(file, "data: one", "", "data: t")
    // cap cuts inside the second frame's data line: only frame 1 completes
    val s = SseFileStreamProvider.advance(file, InitialState,
      maxBytes = Files.size(Paths.get(file)) - 2)
    assert(s.frames === 1L)
    assert(s.bytes === 11L) // exactly past frame 1's terminator
  }

  test("CRLF capture files tail correctly (boundaries on raw bytes)") {
    import SseFileStreamProvider._
    val file = Files.createTempDirectory("ssecrlf").toString + "/cap.sse"
    Files.write(java.nio.file.Paths.get(file),
      "id: a\r\ndata: one\r\n\r\n".getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    val s1 = SseFileStreamProvider.advance(file, InitialState)
    assert(s1.frames === 1L)
    assert(s1.stickyId === "a")
    assert(s1.bytes === Files.size(Paths.get(file)))
    Files.write(java.nio.file.Paths.get(file), "data: two\r\n\r\n".getBytes,
      StandardOpenOption.APPEND)
    val s2 = SseFileStreamProvider.advance(file, s1)
    assert(s2.frames === 2L)
    val evs = SseFileStreamProvider.framesFrom(file, s1).toVector
    assert(evs.map(_.data) === Vector("two"))
    assert(evs.head.id === "a")
  }

  test("full system: SSE capture → pipeline → manifest sink → dashboard") {
    import graft.{GraftConfig => GC}
    import graft.sinks.ManifestSink
    val file = Files.createTempDirectory("ssee2e").toString + "/capture.sse"
    val sinkDir = Files.createTempDirectory("ssee2e_sink").toString + "/t"
    val json = scala.io.Source
      .fromFile(fixturePath("recentchange_fixture.jsonl")).getLines().toSeq
    json.foreach(j => append(file, "event: message", s"data: $j", ""))
    val raw = spark.readStream.format("sse-file").load(file)
      .filter($"event" === "message").select($"data".as("value"))
    val cfg = GC(dbMaxEvents = 100)
    val q = graft.streaming.WikiStream.fromRawLines(raw)
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        graft.streaming.WikiStream
          .appendWithRetentionManifest(batch, sinkDir, cfg)
      }
      .start()
    try {
      q.processAllAvailable()
      // replayed frames (appended again to the capture) are absorbed by
      // the sink-level UNIQUE anti-join
      json.take(2).foreach(j => append(file, "event: message", s"data: $j", ""))
      q.processAllAvailable()
      val sink = ManifestSink.read(spark, sinkDir)
      assert(sink.count() === 3) // the 3 fixture survivors, once
      val metrics = graft.metrics.Dashboard.metricsFrame(sink).head()
      assert(metrics.getAs[Long]("total_rows") === 3L)
      assert(metrics.getAs[java.sql.Timestamp]("latest_event_time") ===
        java.sql.Timestamp.valueOf("2026-01-08 22:35:54"))
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
