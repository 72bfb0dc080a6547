package graft.sources.sse

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.util.{Map => JMap}

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.SseFrames

/** DataSourceV2 micro-batch source over an append-only SSE capture file —
  * the faithful S1 source (SURVEY.md §2.1/§7.4) in the form that is
  * testable without network egress: a live SSE connection writes protocol
  * frames to a capture file; this source tails it transactionally.
  *
  * Usage: `spark.readStream.format("sse-file").load(path)` →
  * schema (event string, data string, id string).
  *
  * Options:
  *   - `maxBytesPerTrigger` (default 256 MiB): cap on capture-file bytes
  *     admitted per micro-batch — the count-based-commit (K4) rate limit,
  *     and the bound on per-batch reader memory.
  *
  * Offsets count COMPLETE frames (blank-line-terminated), so a
  * half-written trailing frame is never consumed early, and replay from a
  * checkpoint re-reads exactly the committed frame range — the same
  * at-least-once-then-dedup contract as the reference's `?since=` resume
  * (SURVEY.md §1.4.3).
  *
  * Incremental tailing: the driver keeps a parse state (frames, bytes,
  * sticky event id) per committed boundary, so each `latestOffset` reads
  * only the newly-appended tail — O(delta), not O(file) — and partition
  * readers seek to the nearest known byte boundary instead of re-parsing
  * from the start. The one unavoidable full parse is the first replayed
  * batch after a checkpoint restart (frame counts are the durable offset;
  * byte positions are an in-memory cache).
  */
class SseFileStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sse-file"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SseFileStreamProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("sse-file source requires a path"))
    val maxBytes = Option(properties.get("maxBytesPerTrigger"))
      .map(_.toLong).getOrElse(SseFileStreamProvider.DefaultMaxBytesPerTrigger)
    new SseFileTable(path, maxBytes)
  }
}

object SseFileStreamProvider {
  val schema: StructType = StructType(Seq(
    StructField("event", StringType),
    StructField("data", StringType),
    StructField("id", StringType)))

  val DefaultMaxBytesPerTrigger: Long = 256L * 1024 * 1024

  /** Sequential-parse resume point: `frames` complete events emitted from
    * the first `bytes` bytes of the capture file, with sticky
    * last-event-id `stickyId` at that boundary. `bytes` always lands just
    * after a frame terminator (or at 0), so resuming there is exact. */
  private[sse] final case class ParseState(frames: Long, bytes: Long,
      stickyId: String)
  private[sse] val InitialState = ParseState(0L, 0L, "")

  /** Iterator over the COMPLETE ('\n'-terminated) lines in the byte range
    * [from, min(to, eof)) of `path`, streaming (fixed buffer, no
    * whole-range materialization). Terminators are '\n' only — bytes for
    * each line are decoded as UTF-8, safe because '\n' never occurs inside
    * a multi-byte sequence and range boundaries land on line boundaries.
    * Tracks bytes consumed through the last blank line (frame terminator)
    * and the sticky `id:` value at that point, for parse-state capture. */
  private[sse] final class BoundedLineIterator(path: String, from: Long,
      to: Long, initialSticky: String) extends Iterator[String] {
    private val exists = Files.exists(Paths.get(path))
    private val ch = if (exists)
      Files.newByteChannel(Paths.get(path), StandardOpenOption.READ) else null
    private val limit = if (exists) math.min(to, ch.size()) else 0L
    if (exists) ch.position(math.min(from, limit))
    private var pos = if (exists) math.min(from, limit) else 0L
    private val buf = java.nio.ByteBuffer.allocate(64 * 1024)
    buf.limit(0)
    private val lineBytes = new java.io.ByteArrayOutputStream(256)
    private var nextLine: String = null
    private var closed = !exists

    /** Absolute byte offset just past the most recent frame terminator. */
    var bytesThroughLastBlank: Long = from
    /** Sticky last-event-id as of `bytesThroughLastBlank`. */
    var stickyAtLastBlank: String = initialSticky
    private var stickyCur = initialSticky

    private def fill(): Boolean = {
      if (closed) return false
      if (buf.hasRemaining) return true
      if (pos >= limit) { ch.close(); closed = true; return false }
      buf.clear()
      val want = math.min(buf.capacity().toLong, limit - pos).toInt
      buf.limit(want)
      var read = 0
      while (read < want) {
        val n = ch.read(buf)
        if (n < 0) { // file shrank under us; treat as EOF
          buf.limit(buf.position()); pos = limit; read = want
        } else read += n
      }
      buf.flip()
      true
    }

    private def advance(): Unit = {
      lineBytes.reset()
      while (nextLine == null && fill()) {
        while (nextLine == null && buf.hasRemaining) {
          val b = buf.get()
          pos += 1
          if (b == '\n') {
            val raw = new String(lineBytes.toByteArray, StandardCharsets.UTF_8)
            // tolerate \r\n terminators: boundary/sticky logic must see the
            // same line content the frame parser does (byte math stays raw)
            val line = if (raw.endsWith("\r")) raw.dropRight(1) else raw
            lineBytes.reset()
            if (line.isEmpty) {
              bytesThroughLastBlank = pos
              stickyAtLastBlank = stickyCur
            } else if (!line.startsWith(":")) {
              val (f, v) = SseFrames.splitField(line)
              if (f == "id") stickyCur = v
            }
            nextLine = line
          } else lineBytes.write(b)
        }
      }
      // an unterminated trailing partial line is NOT a complete line: drop
    }

    override def hasNext: Boolean = {
      if (nextLine == null) advance()
      nextLine != null
    }
    override def next(): String = {
      if (nextLine == null) advance()
      val l = nextLine; nextLine = null; l
    }

    /** Release the file channel. Idempotent. Exhausting the iterator closes
      * it implicitly, but consumers that stop early (a partition reader
      * that has emitted its frame quota) MUST call this — otherwise the
      * channel lives until GC, one leaked descriptor per micro-batch. */
    def close(): Unit = {
      if (!closed) { closed = true; ch.close() }
    }
  }

  /** Advance a parse state over newly-appended complete frames, admitting
    * at most `maxBytes` new bytes: O(tail), not O(file). */
  private[sse] def advance(path: String, state: ParseState,
      maxBytes: Long = Long.MaxValue): ParseState = {
    val cap = if (Long.MaxValue - state.bytes < maxBytes) Long.MaxValue
      else state.bytes + maxBytes
    val lines = new BoundedLineIterator(path, state.bytes, cap, state.stickyId)
    try {
      val events = SseFrames.frameIterator(lines, emitOpenTail = false,
        initialId = state.stickyId).size.toLong
      if (lines.bytesThroughLastBlank == state.bytes) state
      else ParseState(state.frames + events, lines.bytesThroughLastBlank,
        lines.stickyAtLastBlank)
    } finally lines.close()
  }

  /** Complete frames starting at parse state `base`, bounded by `toByte`. */
  private[sse] def framesFrom(path: String, base: ParseState,
      toByte: Long = Long.MaxValue): Iterator[SseFrames.SseEvent] =
    SseFrames.frameIterator(
      new BoundedLineIterator(path, base.bytes, toByte, base.stickyId),
      emitOpenTail = false, initialId = base.stickyId)

  /** All complete frames currently in the file (unit-test surface; the
    * streaming path uses the incremental `advance`/`framesFrom`). */
  private[sse] def completeFrames(path: String): Iterator[SseFrames.SseEvent] =
    framesFrom(path, InitialState)

  private[sse] def longDrop[T](it: Iterator[T], n: Long): Iterator[T] = {
    var left = n
    while (left > 0 && it.hasNext) { it.next(); left -= 1 }
    it
  }
}

class SseFileTable(path: String, maxBytesPerTrigger: Long)
    extends Table with SupportsRead {
  override def name(): String = s"sse-file:$path"
  override def schema(): StructType = SseFileStreamProvider.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SseFileStreamProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SseFileMicroBatchStream(path, maxBytesPerTrigger)
      }
    }
}

/** Offset = count of complete frames consumed so far. */
case class SseFrameOffset(frames: Long) extends Offset {
  override def json(): String = frames.toString
}

class SseFileMicroBatchStream(path: String, maxBytesPerTrigger: Long)
    extends MicroBatchStream {
  import SseFileStreamProvider._

  // Driver-side incremental parse cache: frame count → parse state at that
  // committed boundary. 0 is always present, so after a checkpoint restart
  // (cache empty, offsets replayed from the WAL) the replay partition falls
  // back to a from-the-start parse exactly once.
  private val boundaries = mutable.TreeMap[Long, ParseState](0L -> InitialState)
  private var tail = InitialState

  override def initialOffset(): Offset = SseFrameOffset(0L)

  override def latestOffset(): Offset = synchronized {
    tail = advance(path, tail, maxBytesPerTrigger)
    boundaries(tail.frames) = tail
    SseFrameOffset(tail.frames)
  }

  override def deserializeOffset(json: String): Offset =
    SseFrameOffset(json.toLong)

  override def commit(end: Offset): Unit = synchronized {
    // boundaries below the committed offset can no longer be replayed
    val f = end.asInstanceOf[SseFrameOffset].frames
    val stale = boundaries.rangeUntil(f).keys.toList.dropRight(1)
    stale.foreach(boundaries.remove)
  }

  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = synchronized {
    val startF = start.asInstanceOf[SseFrameOffset].frames
    val endF = end.asInstanceOf[SseFrameOffset].frames
    // nearest cached boundary at or below the batch start (0 always there)
    val base = boundaries.rangeTo(startF).last._2
    // exact end byte when the end boundary is cached; else EOF-bounded
    val toByte = boundaries.get(endF).map(_.bytes).getOrElse(Long.MaxValue)
    Array(SseFilePartition(path, base.bytes, base.stickyId,
      startF - base.frames, endF - startF, toByte))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[SseFilePartition]
        // keep a handle on the line iterator (not just the frame iterator
        // wrapping it) so close() can release the file channel even when
        // the frame quota is exhausted before the byte limit — otherwise
        // the descriptor leaks for every batch that doesn't end at EOF
        val lines = new SseFileStreamProvider.BoundedLineIterator(
          p.path, p.fromByte, p.toByte, p.stickyId)
        val frames = longDrop(
          SseFrames.frameIterator(lines, emitOpenTail = false,
            initialId = p.stickyId),
          p.skipFrames)
        new PartitionReader[InternalRow] {
          private var current: SseFrames.SseEvent = _
          private var remaining = p.takeFrames
          override def next(): Boolean = {
            if (remaining > 0 && frames.hasNext) {
              current = frames.next(); remaining -= 1; true
            } else { lines.close(); false }
          }
          override def get(): InternalRow = InternalRow(
            UTF8String.fromString(current.event),
            UTF8String.fromString(current.data),
            UTF8String.fromString(current.id))
          override def close(): Unit = lines.close()
        }
      }
    }
}

/** Byte-seekable read slice: parse from `fromByte` (a frame boundary, with
  * sticky id `stickyId`), skip `skipFrames` events, emit `takeFrames`. */
case class SseFilePartition(path: String, fromByte: Long, stickyId: String,
    skipFrames: Long, takeFrames: Long, toByte: Long) extends InputPartition
