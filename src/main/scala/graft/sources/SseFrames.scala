package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Server-Sent Events protocol parsing (the reference's S1 source,
  * pipeline.py:60-102, delegated there to sseclient).
  *
  * The wire format is text lines: `event:`/`data:`/`id:` fields, frames
  * terminated by a blank line, `:`-prefixed comment lines (heartbeats)
  * ignored, multiple `data:` lines per frame joined with `\n`.
  *
  * Frame assembly is inherently sequential, so it runs per partition with
  * mapPartitions — correct whenever a frame does not span a partition
  * boundary (true for the file-per-batch capture layout this engine uses;
  * a live DataSourceV2 SSE source would feed one partition per connection,
  * preserving the same invariant). A frame left open at partition end
  * (no trailing blank line) is emitted as a final frame.
  */
object SseFrames {

  final case class SseEvent(event: String, data: String, id: String)

  /** SSE field split: `"data: x"` → `("data", "x")`, one optional space
    * after the colon stripped, no colon → whole line is the field name. */
  def splitField(line: String): (String, String) = line.indexOf(':') match {
    case -1 => (line, "")
    case i =>
      val v = line.substring(i + 1)
      (line.substring(0, i), if (v.startsWith(" ")) v.tail else v)
  }

  /** Core frame assembly over a plain line iterator — shared by the
    * Dataset transformation below and the DataSourceV2 micro-batch reader
    * (graft.sources.sse). `emitOpenTail=true` flushes a frame left open at
    * end-of-input (batch capture files); streaming readers pass false so a
    * half-written frame waits for its terminator. `initialId` seeds the
    * sticky last-event-id, letting a reader resume mid-stream at a frame
    * boundary with identical semantics to a from-the-start parse. */
  def frameIterator(it: Iterator[String],
      emitOpenTail: Boolean = true,
      initialId: String = ""): Iterator[SseEvent] =
    new Iterator[SseEvent] {
      private var nextEvent: Option[SseEvent] = None
      private var eventType = "message"
      private var dataParts = List.empty[String]
      private var lastId = initialId

      private def finishFrame(): Option[SseEvent] = {
        // per the SSE spec, an empty data buffer aborts the dispatch
        val joined = dataParts.reverse.mkString("\n")
        val ev =
          if (joined.isEmpty) None
          else Some(SseEvent(eventType, joined, lastId))
        eventType = "message"
        dataParts = Nil
        ev
      }

      private def advance(): Unit = {
        while (nextEvent.isEmpty && it.hasNext) {
          val raw = it.next()
          // SSE line terminators may be \n or \r\n; callers split on \n,
          // so tolerate a trailing \r here (a lone "\r" is a blank line)
          val line = if (raw.endsWith("\r")) raw.dropRight(1) else raw
          if (line.isEmpty) nextEvent = finishFrame()
          else if (line.startsWith(":")) () // comment / heartbeat
          else {
            val (field, value) = splitField(line)
            field match {
              case "event" => eventType = value
              case "data" => dataParts = value :: dataParts
              case "id" => lastId = value
              case _ => () // unknown fields ignored per spec
            }
          }
        }
        if (nextEvent.isEmpty && !it.hasNext && emitOpenTail)
          nextEvent = finishFrame()
      }

      override def hasNext: Boolean = {
        if (nextEvent.isEmpty) advance()
        nextEvent.isDefined
      }
      override def next(): SseEvent = {
        if (nextEvent.isEmpty) advance()
        val e = nextEvent.get
        nextEvent = None
        e
      }
    }

  /** Assemble protocol lines into events. Empty-data frames are dropped,
    * mirroring the reference's `event.data` truthiness check (F1). */
  def parse(lines: Dataset[String]): Dataset[SseEvent] = {
    import lines.sparkSession.implicits._
    lines.mapPartitions(it => frameIterator(it))
  }

  /** F1 frame filter + payload projection: `message` events with non-empty
    * data, as one raw-JSON line column ready for WikiIngest.parseRaw. */
  def messageData(events: Dataset[SseEvent], outCol: String = "value"): DataFrame =
    events.filter(e => e.event == "message" && e.data.nonEmpty)
      .select(col("data").as(outCol))
}
