package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import graft.sinks.ManifestSink

class LateDataChannelSpec extends SparkSpec {
  import spark.implicits._

  private def ts(us: Long) = new Timestamp(us / 1000L)
  private val delay = 50_000_000L // 50 s in µs

  test("late and null-ts rows land in the dead-letter table, " +
      "watermark advances monotonically, replays converge") {
    val root = Files.createTempDirectory("latedlq").toString
    val (main, late) = (s"$root/main", s"$root/late")
    def batch(rows: Seq[(Long, Option[Long])]) =
      rows.map { case (id, us) => (id, us.map(ts).orNull) }
        .toDF("event_id", "ts")
    def ids(dir: String) = ManifestSink.read(spark, dir)
      .select($"event_id").collect().map(_.getLong(0)).toSet

    // batch 0: establishes watermark max(100s, 200s) − 50s = 150s
    LateDataChannel.ingest(
      batch(Seq(1L -> Some(100_000_000L), 2L -> Some(200_000_000L))),
      0L, main, late, "ts", delay)
    assert(ids(main) === Set(1L, 2L))
    assert(ManifestSink.version(spark, late) >= 0 && ids(late) === Set())
    assert(LateDataChannel.watermarkUs(spark, main) === 150_000_000L)

    // batch 1: 120s is behind the 150s watermark → dead-letter; null ts
    // can never be ordered → dead-letter; 300s is on time and advances
    // the watermark to 250s
    LateDataChannel.ingest(
      batch(Seq(3L -> Some(120_000_000L), 4L -> None,
        5L -> Some(300_000_000L))),
      1L, main, late, "ts", delay)
    assert(ids(main) === Set(1L, 2L, 5L))
    assert(ids(late) === Set(3L, 4L))
    assert(LateDataChannel.watermarkUs(spark, main) === 250_000_000L)

    // replaying the SAME epoch (at-least-once delivery) changes nothing
    // on either side — even though the advanced watermark would now
    // classify more of its rows late
    val (vm, vl) =
      (ManifestSink.version(spark, main), ManifestSink.version(spark, late))
    LateDataChannel.ingest(
      batch(Seq(3L -> Some(120_000_000L), 4L -> None,
        5L -> Some(300_000_000L))),
      1L, main, late, "ts", delay)
    assert(ManifestSink.version(spark, main) === vm)
    assert(ManifestSink.version(spark, late) === vl)
    assert(ids(main) === Set(1L, 2L, 5L) && ids(late) === Set(3L, 4L))

    // a batch whose max lags the frontier cannot regress the watermark:
    // 260s − 50s = 210s < 250s → watermark stays 250s, row is on time
    LateDataChannel.ingest(batch(Seq(6L -> Some(260_000_000L))),
      2L, main, late, "ts", delay)
    assert(ids(main) === Set(1L, 2L, 5L, 6L))
    assert(LateDataChannel.watermarkUs(spark, main) === 250_000_000L)
  }

  test("mid-crash replay completes the main side without doubling " +
      "the dead-letter side") {
    val root = Files.createTempDirectory("latedlq2").toString
    val (main, late) = (s"$root/main", s"$root/late")
    def batch(rows: Seq[(Long, Long)]) =
      rows.map { case (id, us) => (id, ts(us)) }.toDF("event_id", "ts")
    LateDataChannel.ingest(batch(Seq(1L -> 200_000_000L)), 0L, main, late,
      "ts", delay)
    // simulate epoch 1 crashing BETWEEN the two commits: only the late
    // side landed (late-first ordering)
    ManifestSink.appendOnce(
      batch(Seq(2L -> 100_000_000L)), late, 1L)
    // the replay of epoch 1 skips the already-committed late side and
    // completes the main side exactly once
    LateDataChannel.ingest(
      batch(Seq(2L -> 100_000_000L, 3L -> 400_000_000L)), 1L, main, late,
      "ts", delay)
    def ids(dir: String) = ManifestSink.read(spark, dir)
      .select($"event_id").collect().map(_.getLong(0)).toSeq.sorted
    assert(ids(late) === Seq(2L))        // not doubled
    assert(ids(main) === Seq(1L, 3L))    // completed exactly once
    assert(LateDataChannel.watermarkUs(spark, main) === 350_000_000L)
  }
}
