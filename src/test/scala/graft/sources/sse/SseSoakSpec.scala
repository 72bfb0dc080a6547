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

  /** One TCP-ish flush unit: the server writes frames in chunks of this
    * many bytes, flushing EACH chunk, so every frame arrives across
    * several reads — the capture's frame reassembly is exercised on
    * every single frame, not only at injected teardowns. */
  private val FlushUnit = 512

  /** Realistic frame payloads (r16 verdict #7): the production frame is
    * a ~1-2 KB nested recentchange document, not the `{"i":n}` stub the
    * first soak fed. Each payload wraps one of the captured wiki
    * fixture docs (cycled) with the soak's unique index and pads to a
    * floor well past [[FlushUnit]], so torn-tail truncation and
    * Last-Event-ID resume run against multi-KB frames that straddle
    * flush boundaries. Deterministic: the end-of-soak assertion
    * recomputes the exact payload per id. */
  private val fixtureDocs: IndexedSeq[String] = {
    val in = getClass.getResourceAsStream("/recentchange_fixture.jsonl")
    require(in != null, "recentchange fixture missing from test resources")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try src.getLines().filter(_.nonEmpty).toIndexedSeq finally src.close()
  }

  private def payload(i: Int): String = {
    val doc = fixtureDocs(i % fixtureDocs.size)
    val base = s"""{"i":$i,"rc":$doc,"pad":""""
    // pad with a position-dependent byte pattern (not a constant) so a
    // reassembly bug that duplicates or drops a chunk can't cancel out
    val pad = (base.length until 1200).map(p => ('a' + (p + i) % 26).toChar)
    base + new String(pad.toArray) + "\"}"
  }

  private def frame(i: Int): String = s"id: e$i\ndata: ${payload(i)}\n\n"

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
      // every frame goes out in FlushUnit-sized chunks, each flushed —
      // a multi-KB frame NEVER arrives in one read
      def writeChunked(bytes: Array[Byte], upTo: Int): Unit = {
        var off = 0
        while (off < upTo) {
          val n = math.min(FlushUnit, upTo - off)
          os.write(bytes, off, n); os.flush(); off += n
        }
      }
      try {
        var cut = false
        while (!cut && done.getCount > 0) {
          if (i < produced.get) {
            val b = frame(i).getBytes(StandardCharsets.UTF_8)
            writeChunked(b, b.length)
            i += 1; served += 1
            if (served >= dropEvery && i < total) {
              // tear the NEXT frame 60% of the way through its multi-KB
              // payload, then drop the connection — the capture must
              // truncate the torn tail and resume from the last
              // complete id, every single time
              val torn = frame(i).getBytes(StandardCharsets.UTF_8)
              writeChunked(torn, (torn.length * 6) / 10)
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

  test("soak: minutes of multi-KB fixture-payload frames across " +
      "continuous injected drops, torn tails, chunked flushes, and a " +
      "mid-soak checkpoint restart land exactly once (D1 dedup invariant)") {
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
      assert(data === payload(id.stripPrefix("e").toInt),
        s"frame $id arrived torn or mismatched " +
          s"(${data.length} bytes): ${data.take(120)}…")
    }
    // the payloads must actually be the multi-KB production shape: every
    // frame bigger than one flush unit (so each crossed several flushed
    // chunks), and the fixture docs genuinely embedded
    (0 until total).foreach { i =>
      assert(payload(i).length > 2 * FlushUnit,
        s"payload $i is ${payload(i).length} B — not multi-flush-unit")
      // the embedded doc is one of the captured fixture lines — most
      // are real nested recentchange docs; one is the deliberately
      // CORRUPT line (the F3 fixture), which a realistic capture
      // stream carries too, so only the wrapper shape is asserted here
      assert(payload(i).contains("\"rc\":"),
        s"payload $i does not embed a fixture doc")
    }
    // the soak must actually have soaked: the feed spans minutes of
    // wall time and the server cut the connection continuously
    assert(server.connects.get >= 5,
      s"only ${server.connects.get} connects — drops were not injected?")
    assert(atRestart < total.toLong,
      "restart happened after the feed drained — phase 2 proved nothing")
  }
}
