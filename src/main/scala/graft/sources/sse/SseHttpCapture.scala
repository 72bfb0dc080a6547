package graft.sources.sse

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.concurrent.atomic.{AtomicBoolean, AtomicInteger, AtomicReference}

import graft.sources.SseFrames

/** Reconnecting SSE→capture-file loop — the reference's outer pipeline loop
  * (pipeline.py:28-58): connect, stream, and on any interruption back off
  * (5 s default, pipeline.py:53-58 `time.sleep(5)`) and reconnect, resuming
  * from the last event seen. Runs as a single daemon thread on the driver;
  * the durable product is an append-only capture file of raw SSE protocol
  * lines that the `sse-file` DataSourceV2 source tails transactionally —
  * the composition that gives a LIVE connection replayable micro-batch
  * offsets (an in-memory socket-style source cannot replay past its
  * buffer; a file can).
  *
  * Resume semantics, in reference order:
  *   - first connect with an empty capture: `?since=<caller's timestamp>`
  *     (pipeline.py:76-78 — `since` only when the database is non-empty);
  *   - every reconnect (and a restart over an existing capture): the
  *     standard `Last-Event-ID` header, recovered from the last COMPLETE
  *     frame in the file. Complete frames only: re-delivery overlap is the
  *     contract (at-least-once), and the downstream watermarked dedup
  *     absorbs it (SURVEY.md §1.4.3).
  *   - a `retry: <ms>` field from the server overrides the backoff, per
  *     the SSE spec (sseclient does the same).
  *
  * Crash/drop hygiene: a connection that dies mid-frame leaves an
  * unterminated partial frame in the file. Before resuming, the tail is
  * truncated back to the last frame boundary — resumed frames must never
  * concatenate onto a partial one (the corrupt-chunk case the reference
  * maps to ChunkedEncodingError + retry, pipeline.py:54-58). Truncation is
  * safe for concurrent readers: the tail source only ever consumes through
  * complete-frame boundaries, so the dropped bytes were never visible.
  *
  * Scale note: one connection = one writer thread = one capture file is
  * the reference's own topology (single SSE client). The capture path must
  * be on storage the executors can read (local FS in local mode, shared FS
  * on a cluster). For multi-stream fan-in at 100 TB the capture layer is
  * where a durable log service would slot in; the DSv2 seam above it is
  * unchanged.
  */
final class SseHttpCapture(url: String, capturePath: String,
    userAgent: String, since: Option[String] = None,
    backoffMs: Long = 5000L, maxConnects: Int = Int.MaxValue)
    extends AutoCloseable {

  private val running = new AtomicBoolean(false)
  private val connectCount = new AtomicInteger(0)
  private val lastError = new AtomicReference[Throwable](null)
  private val closeCurrent = new AtomicReference[() => Unit](null)
  @volatile private var thread: Thread = null

  /** Connections attempted so far (test/monitoring surface). */
  def connects: Int = connectCount.get()
  /** Most recent connection error, if any (O6 dashboard surface). */
  def error: Option[Throwable] = Option(lastError.get())

  def start(): Unit = {
    if (running.compareAndSet(false, true)) {
      thread = new Thread(() => run(), s"sse-http-capture:$url")
      thread.setDaemon(true)
      thread.start()
    }
  }

  /** Stop the loop and release the connection + file channel. Blocks until
    * the thread exits (bounded). Idempotent. */
  override def close(): Unit = {
    running.set(false)
    Option(closeCurrent.get()).foreach(f => f())
    val t = thread
    if (t != null) { t.interrupt(); t.join(10000L) }
  }

  private def run(): Unit = {
    val p = Paths.get(capturePath)
    Option(p.getParent).foreach(Files.createDirectories(_))
    // recover the resume point from an existing capture: parse state at the
    // last complete frame boundary (one O(file) pass, then incremental)
    val recovered = SseFileStreamProvider.advance(
      capturePath, SseFileStreamProvider.InitialState)
    val ch = Files.newByteChannel(p,
      StandardOpenOption.CREATE, StandardOpenOption.WRITE)
    try {
      // drop an unterminated partial frame left by a previous process crash
      if (ch.size() > recovered.bytes) ch.truncate(recovered.bytes)
      var pos = recovered.bytes
      var lastBoundary = pos
      var stickyId = recovered.stickyId   // id as of the last COMPLETE frame
      var pendingId = stickyId            // id seen inside the open frame
      var curBackoff = backoffMs
      var firstAttempt = true
      while (running.get() && connectCount.get() < maxConnects) {
        try {
          val conn = SseHttpClient.connect(url, userAgent,
            since = if (pos == 0L && firstAttempt) since else None,
            lastEventId = Option(stickyId).filter(_.nonEmpty))
          closeCurrent.set(conn.close)
          connectCount.incrementAndGet()
          firstAttempt = false
          try {
            if (conn.status != 200)
              throw new java.io.IOException(
                s"SSE endpoint returned HTTP ${conn.status}")
            // the previous connection may have died mid-frame: resumed
            // frames re-deliver from the last complete one, so cut the
            // partial tail before appending
            if (pos != lastBoundary) {
              ch.truncate(lastBoundary)
              pos = lastBoundary
              pendingId = stickyId
            }
            for (line <- conn.lines if running.get()) {
              val bytes = (line + "\n").getBytes(StandardCharsets.UTF_8)
              ch.position(pos)
              var buf = ByteBuffer.wrap(bytes)
              while (buf.hasRemaining) ch.write(buf)
              pos += bytes.length
              if (line.isEmpty) {
                lastBoundary = pos
                stickyId = pendingId
              } else if (!line.startsWith(":")) {
                val (field, value) = SseFrames.splitField(line)
                if (field == "id") pendingId = value
                else if (field == "retry")
                  value.toLongOption.filter(_ >= 0).foreach(curBackoff = _)
              }
            }
            // server closed cleanly — a live stream should not end, so
            // fall through to the same backoff+reconnect path
          } finally conn.close()
        } catch {
          case e: Exception if running.get() => lastError.set(e)
          case _: Exception => () // shutdown race: close() killed the read
        }
        if (running.get() && connectCount.get() < maxConnects) {
          try Thread.sleep(curBackoff)
          catch { case _: InterruptedException => running.set(false) }
        }
      }
    } finally ch.close()
  }
}
