package graft.sources.sse

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.{Map => JMap}

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
  * Offsets count COMPLETE frames (blank-line-terminated), so a
  * half-written trailing frame is never consumed early, and replay from a
  * checkpoint re-reads exactly the committed frame range — the same
  * at-least-once-then-dedup contract as the reference's `?since=` resume
  * (SURVEY.md §1.4.3).
  */
class SseFileStreamProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sse-file"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SseFileStreamProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("sse-file source requires a path"))
    new SseFileTable(path)
  }
}

object SseFileStreamProvider {
  val schema: StructType = StructType(Seq(
    StructField("event", StringType),
    StructField("data", StringType),
    StructField("id", StringType)))

  /** Iterator over the complete (terminated) frames currently in the file.
    * Lazy: callers count or slice without materializing every frame.
    * (A further optimization for very large captures — remembering the
    * byte offset per committed frame and seeking — slots in here without
    * touching the stream contract.) */
  private[sse] def completeFrames(path: String): Iterator[SseFrames.SseEvent] = {
    if (!Files.exists(Paths.get(path))) return Iterator.empty
    val content = new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8)
    val split = content.split("\n", -1)
    // "line\n" is ONE complete line, not a line plus a blank terminator —
    // drop the phantom empty element a trailing newline produces (a real
    // frame terminator is "line\n\n", which still yields its blank line)
    val lines =
      if (content.endsWith("\n")) split.iterator.take(split.length - 1)
      else split.iterator
    SseFrames.frameIterator(lines, emitOpenTail = false)
  }

  private[sse] def requireIntRange(v: Long): Int = {
    require(v <= Int.MaxValue, s"frame offset $v exceeds supported range")
    v.toInt
  }
}

class SseFileTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"sse-file:$path"
  override def schema(): StructType = SseFileStreamProvider.schema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SseFileStreamProvider.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SseFileMicroBatchStream(path)
      }
    }
}

/** Offset = count of complete frames consumed so far. */
case class SseFrameOffset(frames: Long) extends Offset {
  override def json(): String = frames.toString
}

class SseFileMicroBatchStream(path: String) extends MicroBatchStream {
  override def initialOffset(): Offset = SseFrameOffset(0L)
  override def latestOffset(): Offset =
    SseFrameOffset(SseFileStreamProvider.completeFrames(path).size.toLong)
  override def deserializeOffset(json: String): Offset =
    SseFrameOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(SseFilePartition(path,
      start.asInstanceOf[SseFrameOffset].frames,
      end.asInstanceOf[SseFrameOffset].frames))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[SseFilePartition]
        val frames = SseFileStreamProvider.completeFrames(p.path)
          .slice(SseFileStreamProvider.requireIntRange(p.startFrame),
            SseFileStreamProvider.requireIntRange(p.endFrame))
        new PartitionReader[InternalRow] {
          private var current: SseFrames.SseEvent = _
          override def next(): Boolean = {
            if (frames.hasNext) { current = frames.next(); true } else false
          }
          override def get(): InternalRow = InternalRow(
            UTF8String.fromString(current.event),
            UTF8String.fromString(current.data),
            UTF8String.fromString(current.id))
          override def close(): Unit = ()
        }
      }
    }
}

case class SseFilePartition(path: String, startFrame: Long, endFrame: Long)
  extends InputPartition
