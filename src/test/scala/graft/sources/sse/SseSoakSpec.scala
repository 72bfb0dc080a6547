package graft.sources.sse

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.nio.file.Files
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import scala.util.Try

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import graft.SparkSpec

/** Live-path SOAK (r15 verdict #7): the short loopback tests prove each
  * reconnect/resume mechanism once; this runs the whole S1→D1 chain for
  * minutes of continuous live frames with faults injected the entire
  * time — the server tears the connection down every few dozen frames,
  * each teardown leaves a TORN half-frame on the wire, and the
  * streaming query itself is stopped and restarted from its checkpoint
  * mid-soak. The invariant asserted at the end is the D1 contract
  * (unique-key dedup, first-write-wins) on the DURABLE sink: every
  * produced event lands exactly once — none lost across ~a dozen
  * reconnects, none doubled across the capture-resume and
  * checkpoint-replay boundaries. The exactly-once machinery under test
  * is the composition: capture resumes by Last-Event-ID from the
  * persistent frame log, the file sink replays committed byte offsets,
  * and the streaming dropDuplicates state survives the restart. */
class SseSoakSpec extends SparkSpec {

  private def frame(i: Int): String = s"id: e$i\ndata: {\"i\":$i}\n\n"

  /** Loopback SSE endpoint with a PRODUCTION CLOCK: a feeder thread
    * publishes one frame every `intervalMs` up to `total`. Every
    * connection is cut after `dropEvery` served frames — with a torn
    * half-frame flushed first, the nastiest drop shape — so the soak
    * crosses a reconnect boundary continuously rather than once. After
    * the feed is exhausted the connection is held open on heartbeats. */
  private class SoakServer(total: Int, intervalMs: Long, dropEvery: Int) {
    val produced = new AtomicInteger(0)
    val connects = new AtomicInteger(0)
    private val done = new CountDownLatch(1)
    private val pool = Executors.newCachedThreadPool()
    private val feeder = new Thread(() => {
      while (produced.get < total && !done.await(intervalMs, TimeUnit.MILLISECONDS)) {
        produced.incrementAndGet()
        ()
      }
    }, "soak-feeder")
    feeder.setDaemon(true)
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(pool)
    server.createContext("/stream", (ex: HttpExchange) => {
      connects.incrementAndGet()
      val lastId = Option(ex.getRequestHeaders.getFirst("Last-Event-ID"))
        .getOrElse("")
      var i = lastId.stripPrefix("e").toIntOption.map(_ + 1).getOrElse(0)
      ex.getResponseHeaders.add("Content-Type", "text/event-stream")
      ex.sendResponseHeaders(200, 0)
      val os = ex.getResponseBody
      var served = 0
      try {
        var cut = false
        while (!cut && done.getCount > 0) {
          if (i < produced.get) {
            os.write(frame(i).getBytes(StandardCharsets.UTF_8)); os.flush()
            i += 1; served += 1
            if (served >= dropEvery && i < total) {
              // tear the NEXT frame in half, then drop the connection —
              // the capture must truncate the torn tail and resume from
              // the last complete id, every single time
              os.write(s"id: e$i\ndata: {\"to"
                .getBytes(StandardCharsets.UTF_8))
              os.flush()
              cut = true
            }
          } else if (produced.get >= total) {
            os.write(": keep-alive\n".getBytes(StandardCharsets.UTF_8))
            os.flush()
            Thread.sleep(100)
          } else Thread.sleep(10)
        }
      } catch { case _: Exception => () } // client went away first: fine
      finally ex.close()
    })
    server.start()
    feeder.start()
    val url: String = s"http://127.0.0.1:${server.getAddress.getPort}/stream"
    def stop(): Unit = { done.countDown(); server.stop(0); pool.shutdownNow() }
  }

  private def awaitTrue(timeoutMs: Long)(cond: => Boolean): Boolean = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var ok = cond
    while (!ok && System.nanoTime() < deadline) { Thread.sleep(100); ok = cond }
    ok
  }

  test("soak: minutes of live frames across continuous injected drops, " +
      "torn tails, and a mid-soak checkpoint restart land exactly once " +
      "(D1 dedup invariant)") {
    val total = 240
    val server = new SoakServer(total, intervalMs = 250L, dropEvery = 30)
    val dir = Files.createTempDirectory("sse_soak")
    val capFile = s"$dir/cap.sse"
    val outDir = s"$dir/out"
    val ckpt = s"$dir/ckpt"

    // the D1 stage: unique-key dedup on the event id — with a torn
    // frame injected before every drop and a checkpoint replay in the
    // middle, any at-least-once leak upstream surfaces here as a double
    def start() = spark.readStream.format("sse-http")
      .option("url", server.url)
      .option("capturePath", capFile)
      .option("userAgent", "graft-soak/0.1")
      .option("backoffMs", "50")
      .load()
      .dropDuplicates("id")
      .writeStream.format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").start()

    def landed(): Long =
      Try(spark.read.parquet(outDir).count()).getOrElse(0L)

    val q1 = start()
    try {
      // phase 1: soak through at least two injected drops' worth of
      // frames, then stop the query GRACEFULLY mid-feed (the capture
      // thread dies with it; frames keep being produced server-side)
      assert(awaitTrue(120000L)(landed() >= 80L),
        s"phase 1 never landed 80 rows (landed=${landed()}, " +
          s"produced=${server.produced.get}, connects=${server.connects.get})")
    } finally q1.stop()
    val atRestart = landed()

    // phase 2: restart from the same checkpoint + capture file. The
    // capture resumes the LIVE connection by Last-Event-ID from the
    // persistent frame log's tail; the sink replays only uncommitted
    // offsets; the dedup state is restored from the checkpoint.
    val q2 = start()
    try {
      assert(awaitTrue(180000L)(landed() >= total.toLong),
        s"soak never drained all $total rows (landed=${landed()}, " +
          s"produced=${server.produced.get}, connects=${server.connects.get})")
    } finally { q2.stop(); server.stop() }

    // THE invariant: every produced id exactly once — no loss across
    // ~total/dropEvery reconnects, no doubles across the restart
    val rows = spark.read.parquet(outDir)
      .selectExpr("id", "data").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(rows.size === total, s"row count ${rows.size} != $total " +
      "(a doubled or lost frame)")
    assert(rows.map(_._1).distinct.size === total,
      s"doubled ids: ${rows.map(_._1).diff(rows.map(_._1).distinct)}")
    assert(rows.map(_._1).toSet === (0 until total).map(i => s"e$i").toSet)
    rows.foreach { case (id, data) =>
      assert(data === s"""{"i":${id.stripPrefix("e")}}""",
        s"frame $id arrived torn or mismatched: $data")
    }
    // the soak must actually have soaked: the feed spans minutes of
    // wall time and the server cut the connection continuously
    assert(server.connects.get >= 5,
      s"only ${server.connects.get} connects — drops were not injected?")
    assert(atRestart < total.toLong,
      "restart happened after the feed drained — phase 2 proved nothing")
  }
}
