package graft.sources.sse

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.concurrent.{ConcurrentLinkedQueue, CountDownLatch, Executors, TimeUnit}

import scala.jdk.CollectionConverters._

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** Live-HTTP SSE source against a loopback SSE server (JDK HttpServer):
  * the network semantics of pipeline.py:60-102 — headers, `?since=`,
  * reconnect-with-resume, partial-frame hygiene — exercised end to end
  * without egress. */
class SseHttpStreamSpec extends SparkSpec {

  /** One observed client request. */
  private case class Req(query: String, userAgent: String, accept: String,
      lastEventId: String)

  private def frame(i: Int): String = s"id: e$i\ndata: {\"i\":$i}\n\n"

  /** Loopback SSE server. Per connection, `plan(connIndex, lastEventId)`
    * returns (chunks to stream, holdOpen): chunks are written+flushed in
    * order; holdOpen keeps the connection alive afterwards (a live stream
    * with heartbeats) until the server shuts down; otherwise the server
    * drops the connection (the reconnect trigger). */
  private class SseServer(plan: (Int, String) => (Seq[String], Boolean)) {
    val requests = new ConcurrentLinkedQueue[Req]()
    private val done = new CountDownLatch(1)
    private val pool = Executors.newCachedThreadPool()
    private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(pool)
    server.createContext("/stream", (ex: HttpExchange) => {
      val h = ex.getRequestHeaders
      val lastId = Option(h.getFirst("Last-Event-ID")).getOrElse("")
      requests.add(Req(
        Option(ex.getRequestURI.getQuery).getOrElse(""),
        Option(h.getFirst("User-Agent")).getOrElse(""),
        Option(h.getFirst("Accept")).getOrElse(""),
        lastId))
      val (chunks, holdOpen) = plan(requests.size - 1, lastId)
      ex.getResponseHeaders.add("Content-Type", "text/event-stream")
      ex.sendResponseHeaders(200, 0)
      val os = ex.getResponseBody
      try {
        chunks.foreach { c =>
          os.write(c.getBytes(StandardCharsets.UTF_8)); os.flush()
        }
        if (holdOpen) {
          // heartbeat comments while held open, like the live endpoint
          while (!done.await(200, TimeUnit.MILLISECONDS)) {
            os.write(": keep-alive\n".getBytes(StandardCharsets.UTF_8))
            os.flush()
          }
        }
      } catch { case _: Exception => () } // client went away first: fine
      finally ex.close()
    })
    server.start()
    val url: String = s"http://127.0.0.1:${server.getAddress.getPort}/stream"
    def stop(): Unit = { done.countDown(); server.stop(0); pool.shutdownNow() }
  }

  private def awaitTrue(timeoutMs: Long = 30000L)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(25); ok = cond }
    ok
  }

  test("client sends stream headers and ?since= composed onto the url") {
    val server = new SseServer((_, _) => (Seq(frame(0)), false))
    try {
      val conn = SseHttpClient.connect(server.url + "?stream=recentchange",
        userAgent = "graft-test/0.1", since = Some("2026-01-01T00:00:00Z"))
      val lines = conn.lines.toList
      conn.close()
      assert(conn.status === 200)
      assert(lines.contains("data: {\"i\":0}"))
      val req = server.requests.peek()
      assert(req.accept === "text/event-stream")
      assert(req.userAgent === "graft-test/0.1")
      // composes with the existing query string via '&' (getQuery decodes)
      assert(req.query === "stream=recentchange&since=2026-01-01T00:00:00Z")
      assert(req.lastEventId === "")
    } finally server.stop()
  }

  test("capture reconnects with Last-Event-ID after a dropped connection") {
    // conn 0: frames 0-4 then drop; conn 1+: resume after the id the
    // client presents, serve through frame 9, hold open
    val server = new SseServer((conn: Int, lastId: String) =>
      if (conn == 0) ((0 to 4).map(frame), false)
      else {
        val from = lastId.stripPrefix("e").toIntOption.map(_ + 1).getOrElse(0)
        ((from to 9).map(frame), true)
      }
    )
    val capFile = Files.createTempDirectory("ssehttp").toString + "/cap.sse"
    val capture = new SseHttpCapture(server.url, capFile,
      userAgent = "graft-test/0.1", since = Some("2026-01-01T00:00:00Z"),
      backoffMs = 30L)
    try {
      capture.start()
      assert(awaitTrue() {
        Files.exists(Paths.get(capFile)) &&
          SseFileStreamProvider.completeFrames(capFile).size == 10
      }, s"capture never reached 10 frames (connects=${capture.connects})")
      val events = SseFileStreamProvider.completeFrames(capFile).toList
      assert(events.map(_.data) === (0 to 9).map(i => s"""{"i":$i}""").toList)
      val reqs = server.requests.asScala.toList
      assert(reqs.size >= 2)
      // first connect: fresh capture → since=, no Last-Event-ID
      assert(reqs.head.query === "since=2026-01-01T00:00:00Z")
      assert(reqs.head.lastEventId === "")
      // reconnect: Last-Event-ID from the last complete frame, no since=
      assert(reqs(1).lastEventId === "e4")
      assert(reqs(1).query === "")
    } finally { capture.close(); server.stop() }
  }

  test("partial frame at a drop is truncated, never merged with resumed data") {
    // conn 0: two complete frames plus a torn half-frame, then drop;
    // conn 1+: resume after lastId, through frame 3, hold open
    val server = new SseServer((conn: Int, lastId: String) =>
      if (conn == 0)
        (Seq(frame(0), frame(1), "id: e2\ndata: {\"i\":2"), false)
      else {
        val from = lastId.stripPrefix("e").toIntOption.map(_ + 1).getOrElse(0)
        ((from to 3).map(frame), true)
      }
    )
    // pre-seed the capture with a crash leftover: a complete frame the
    // startup scan must keep, plus an unterminated tail it must truncate
    val capFile = Files.createTempDirectory("ssehttp").toString + "/cap.sse"
    Files.write(Paths.get(capFile),
      "id: e9\ndata: {\"i\":9}\n\nid: junk\ndata: {\"half".getBytes(StandardCharsets.UTF_8))
    val capture = new SseHttpCapture(server.url, capFile,
      userAgent = "graft-test/0.1", backoffMs = 30L)
    try {
      capture.start()
      assert(awaitTrue() {
        SseFileStreamProvider.completeFrames(capFile).size == 5
      }, s"capture never reached 5 frames (connects=${capture.connects})")
      val events = SseFileStreamProvider.completeFrames(capFile).toList
      // seeded frame survives; torn seeded tail and torn live frame are
      // gone; frames 0-3 arrive exactly once, intact
      assert(events.map(_.data) ===
        List("{\"i\":9}", "{\"i\":0}", "{\"i\":1}", "{\"i\":2}", "{\"i\":3}"))
      // capture was non-empty at start → resume by id only, never since=
      val reqs = server.requests.asScala.toList
      assert(reqs.head.query === "")
      assert(reqs.head.lastEventId === "e9")
      assert(reqs.exists(_.lastEventId === "e1")) // post-drop resume point
    } finally { capture.close(); server.stop() }
  }

  test("sse-http DSv2 source streams a live endpoint into micro-batches") {
    val server = new SseServer((conn: Int, lastId: String) =>
      if (conn == 0) ((0 to 3).map(frame), false)
      else {
        val from = lastId.stripPrefix("e").toIntOption.map(_ + 1).getOrElse(0)
        ((from to 7).map(frame), true)
      }
    )
    val dir = Files.createTempDirectory("ssehttp")
    val capFile = s"$dir/cap.sse"
    val q = spark.readStream.format("sse-http")
      .option("url", server.url)
      .option("capturePath", capFile)
      .option("userAgent", "graft-test/0.1")
      .option("backoffMs", "30")
      .load()
      .writeStream.format("memory").queryName("sse_http_live")
      .option("checkpointLocation", s"$dir/ckpt")
      .outputMode("append").start()
    try {
      assert(awaitTrue() {
        spark.table("sse_http_live").count() == 8
      }, "live stream never delivered 8 rows")
      val rows = spark.table("sse_http_live")
        .selectExpr("event", "data", "id").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._3)
      assert(rows.map(_._1).forall(_ == "message"))
      assert(rows.map(_._2).toList === (0 to 7).map(i => s"""{"i":$i}""").toList)
      assert(rows.map(_._3).toList === (0 to 7).map(i => s"e$i").toList)
      assert(server.requests.size >= 2) // survived the drop mid-run
    } finally { q.stop(); server.stop() }
  }

  test("non-200 responses are retried like connection drops") {
    // the reference retries Timeout/ConnectionError/ChunkedEncodingError
    // (pipeline.py:53-58); a 503 from the endpoint must take the same
    // backoff-and-reconnect path, not loop hot or die
    val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = Executors.newCachedThreadPool()
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(pool)
    server.createContext("/stream", (ex: HttpExchange) => {
      val n = attempts.incrementAndGet()
      if (n <= 2) { // two failures, then a healthy stream
        ex.sendResponseHeaders(503, -1)
        ex.close()
      } else {
        ex.getResponseHeaders.add("Content-Type", "text/event-stream")
        ex.sendResponseHeaders(200, 0)
        val os = ex.getResponseBody
        os.write(frame(0).getBytes(StandardCharsets.UTF_8)); os.flush()
        // hold briefly so the capture reads the frame before close
        Thread.sleep(200)
        ex.close()
      }
    })
    server.start()
    val capFile = Files.createTempDirectory("ssehttp").toString + "/cap.sse"
    val capture = new SseHttpCapture(
      s"http://127.0.0.1:${server.getAddress.getPort}/stream", capFile,
      userAgent = "graft-test/0.1", backoffMs = 30L)
    try {
      capture.start()
      assert(awaitTrue() {
        SseFileStreamProvider.completeFrames(capFile).size == 1
      }, s"frame never arrived after 503s (connects=${capture.connects})")
      assert(attempts.get() >= 3)
    } finally {
      capture.close(); server.stop(0); pool.shutdownNow()
    }
  }

  test("startLive restart recovers since= from the sink's newest event (S3)") {
    import graft.sinks.ManifestSink
    val json = scala.io.Source
      .fromFile(fixturePath("recentchange_fixture.jsonl")).getLines().toList
    val frames = json.zipWithIndex.map { case (j, i) =>
      s"id: e$i\nevent: message\ndata: $j\n\n"
    }
    val server = new SseServer((conn: Int, _: String) =>
      if (conn == 0) (frames, true) // phase 1: everything, hold open
      else (Nil, true)              // phase 2: nothing new, hold open
    )
    val dir = Files.createTempDirectory("sseresume")
    val sinkDir = s"$dir/sink"
    val q1 = graft.streaming.WikiStream.startLive(spark, server.url,
      capturePath = s"$dir/cap.sse", sinkDir = sinkDir,
      checkpointDir = s"$dir/ckpt1",
      cfg = graft.GraftConfig(dbMaxEvents = 100),
      userAgent = "graft-test/0.1", backoffMs = 30L, trigger = None)
    try {
      assert(awaitTrue() {
        ManifestSink.version(spark, sinkDir) >= 0 &&
          ManifestSink.read(spark, sinkDir).count() == 3
      }, "phase 1 never filled the sink")
    } finally q1.stop()
    // capture rotated away + fresh checkpoint; the SINK carries the resume
    // point — the reference's database_init MAX(event_timestamp) handoff
    // (pipeline.py:225-236)
    Files.deleteIfExists(Paths.get(s"$dir/cap.sse"))
    val before = server.requests.size
    val q2 = graft.streaming.WikiStream.startLive(spark, server.url,
      capturePath = s"$dir/cap.sse", sinkDir = sinkDir,
      checkpointDir = s"$dir/ckpt2",
      cfg = graft.GraftConfig(dbMaxEvents = 100),
      userAgent = "graft-test/0.1", backoffMs = 30L, trigger = None)
    try {
      assert(awaitTrue() { server.requests.size > before },
        "phase 2 never reconnected")
      val resumed = server.requests.asScala.toList.drop(before).head
      assert(resumed.query === "since=2026-01-08T22:35:54Z")
      assert(resumed.lastEventId === "") // fresh capture: no event id yet
      // O4: SINCE_OVERRIDE + non-empty sink must refuse
      val err = intercept[IllegalArgumentException] {
        graft.streaming.WikiStream.startLive(spark, server.url,
          capturePath = s"$dir/cap3.sse", sinkDir = sinkDir,
          checkpointDir = s"$dir/ckpt3",
          cfg = graft.GraftConfig(dbMaxEvents = 100,
            sinceOverride = Some("2026-01-01T00:00:00Z")))
      }
      assert(err.getMessage.contains("SINCE_OVERRIDE"))
    } finally { q2.stop(); server.stop() }
  }

  test("startLive: endpoint → pipeline → manifest sink, reference main() shape") {
    import graft.sinks.ManifestSink
    val json = scala.io.Source
      .fromFile(fixturePath("recentchange_fixture.jsonl")).getLines().toList
    val frames = json.zipWithIndex.map { case (j, i) =>
      s"id: e$i\nevent: message\ndata: $j\n\n"
    }
    // serve half, drop, serve the rest on the resumed connection
    val server = new SseServer((conn: Int, lastId: String) =>
      if (conn == 0) (frames.take(frames.size / 2), false)
      else {
        val from = lastId.stripPrefix("e").toIntOption.map(_ + 1).getOrElse(0)
        (frames.drop(from), true)
      }
    )
    val dir = Files.createTempDirectory("sselive")
    val sinkDir = s"$dir/sink"
    val q = graft.streaming.WikiStream.startLive(spark, server.url,
      capturePath = s"$dir/cap.sse", sinkDir = sinkDir,
      checkpointDir = s"$dir/ckpt",
      cfg = graft.GraftConfig(dbMaxEvents = 100),
      userAgent = "graft-test/0.1", backoffMs = 30L, trigger = None)
    try {
      // 3 fixture survivors after F1-F4 filters + D1 dedup (same oracle as
      // the sse-file full-system test)
      assert(awaitTrue() {
        ManifestSink.version(spark, sinkDir) >= 0 &&
          ManifestSink.read(spark, sinkDir).count() == 3
      }, "live pipeline never materialized the 3 fixture survivors")
      assert(server.requests.asScala.count(_.lastEventId.nonEmpty) >= 1)
    } finally { q.stop(); server.stop() }
  }

  private def wikiJson(dt: String, title: String): String =
    s"""{"meta":{"dt":"$dt"},"type":"edit","title":"$title",""" +
      s""""title_url":"http://x/$title","user":"alice","bot":false,""" +
      s""""length":{"old":1,"new":5}}"""

  test("startLive late-aware: behind-watermark event lands in the " +
      "dead-letter table; main table and watermark intact") {
    import graft.sinks.ManifestSink
    import graft.streaming.LateDataChannel
    val onTime = Seq(
      wikiJson("2024-01-01T00:10:00Z", "A"),
      wikiJson("2024-01-01T00:10:30Z", "B"))
    val lateJson = wikiJson("2024-01-01T00:05:00Z", "LATE")
    // the late event is held back until the main table has committed the
    // on-time batch — the split must be observed against an ESTABLISHED
    // watermark, not a same-batch race
    val mainReady = new java.util.concurrent.atomic.AtomicBoolean(false)
    val server = new SseServer((conn, _) =>
      if (conn == 0)
        (onTime.zipWithIndex.map { case (j, i) =>
          s"id: e$i\nevent: message\ndata: $j\n\n" }, false)
      else if (!mainReady.get()) (Seq(), false)
      else (Seq(s"id: e9\nevent: message\ndata: $lateJson\n\n"), true))
    val dir = Files.createTempDirectory("sselate")
    val sinkDir = s"$dir/sink"
    val lateDir = s"$dir/late"
    val q = graft.streaming.WikiStream.startLive(spark, server.url,
      capturePath = s"$dir/cap.sse", sinkDir = sinkDir,
      checkpointDir = s"$dir/ckpt",
      cfg = graft.GraftConfig(dbMaxEvents = 100),
      userAgent = "graft-test/0.1", backoffMs = 30L, trigger = None,
      lateDir = lateDir, lateDelayUs = 10_000_000L)
    try {
      // phase 1: on-time events commit; watermark = max(ts) − 10 s
      assert(awaitTrue() {
        ManifestSink.version(spark, sinkDir) >= 0 &&
          ManifestSink.read(spark, sinkDir).count() == 2
      }, "on-time events never landed in the main table")
      val wm1 = LateDataChannel.watermarkUs(spark, sinkDir)
      assert(wm1 === java.time.Instant.parse("2024-01-01T00:10:20Z")
        .toEpochMilli * 1000L)
      mainReady.set(true)
      // phase 2: the late event lands in the dead-letter table, not main
      assert(awaitTrue() {
        ManifestSink.version(spark, lateDir) >= 0 &&
          ManifestSink.read(spark, lateDir).count() == 1
      }, "late event never landed in the dead-letter table")
      assert(ManifestSink.read(spark, lateDir)
        .select("title").head().getString(0) === "LATE")
      assert(ManifestSink.read(spark, sinkDir).count() === 2,
        "late event must not reach the main table")
      // the watermark survived the late delivery (never regressed)
      assert(LateDataChannel.watermarkUs(spark, sinkDir) === wm1)
    } finally { q.stop(); server.stop() }
  }
}
