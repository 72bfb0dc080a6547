package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.streaming.{StreamingQueryException, Trigger}

import graft.SparkSpec
import graft.sinks.ManifestSink

class ManifestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def table(tag: String): String =
    Files.createTempDirectory(s"mstream$tag").toString + "/t"

  private def drain(dir: String, ckpt: String, sink: String,
      opts: Map[String, String] = Map.empty): Unit = {
    val q = opts.foldLeft(
        spark.readStream.format("manifest-stream").option("path", dir)) {
        case (r, (k, v)) => r.option(k, v)
      }
      .load()
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
        if (!b.isEmpty) ManifestSink.appendOnce(b, sink, id)
        ()
      }
      .start()
    q.awaitTermination(120000L)
  }

  private def ids(sink: String): Seq[Long] =
    ManifestSink.read(spark, sink).select("k")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("the sink is a source: snapshot first batch, then per-commit tails") {
    val dir = table("chain")
    val sink = table("chainsink")
    val ckpt = Files.createTempDirectory("mstreamckpt").toString
    ManifestSink.append(Seq(1L, 2L).toDF("k"), dir)
    ManifestSink.append(Seq(3L).toDF("k"), dir)
    drain(dir, ckpt, sink) // first batch = snapshot through v1
    assert(ids(sink) === Seq(1L, 2L, 3L))
    // two more commits; the resumed checkpoint streams ONLY the window
    ManifestSink.append(Seq(4L).toDF("k"), dir)
    ManifestSink.append(Seq(5L, 6L).toDF("k"), dir)
    drain(dir, ckpt, sink)
    assert(ids(sink) === Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // nothing new: a replayed drain commits nothing anywhere
    val (vd, vs) =
      (ManifestSink.version(spark, dir), ManifestSink.version(spark, sink))
    drain(dir, ckpt, sink)
    assert(ManifestSink.version(spark, dir) === vd)
    assert(ManifestSink.version(spark, sink) === vs)
  }

  test("maxVersionsPerTrigger bounds each micro-batch's window") {
    val dir = table("cap")
    val sink = table("capsink")
    val ckpt = Files.createTempDirectory("mstreamcap").toString
    (1L to 4L).foreach(i => ManifestSink.append(Seq(i).toDF("k"), dir))
    drain(dir, ckpt, sink, Map("maxVersionsPerTrigger" -> "1"))
    assert(ids(sink) === Seq(1L, 2L, 3L, 4L))
    // one epoch per remaining version past the snapshot batch: the
    // snapshot covered v0..v0, then v1, v2, v3 — four sink commits
    assert(ManifestSink.version(spark, sink) === 3L)
  }

  test("delete windows refuse without ignoreDeletes; inserts-only with") {
    val dir = table("del")
    val sink = table("delsink")
    val ckpt = Files.createTempDirectory("mstreamdel").toString
    ManifestSink.append(Seq(1L, 2L, 3L).toDF("k"), dir)
    drain(dir, ckpt, sink)
    ManifestSink.deleteRangeMergeOnRead(spark, dir, "k", Some(2L), Some(2L))
    ManifestSink.append(Seq(9L).toDF("k"), dir)
    val e = intercept[StreamingQueryException] {
      drain(dir, ckpt, sink)
    }
    assert(e.getMessage.contains("ignoreDeletes") ||
      e.getCause.getMessage.contains("ignoreDeletes"))
    drain(dir, ckpt, sink, Map("ignoreDeletes" -> "true"))
    // the stream carried the INSERT only; the retraction of 2 is the
    // downstream's business (documented inserts-only contract)
    assert(ids(sink) === Seq(1L, 2L, 3L, 9L))
    // rewrite windows need ignoreChanges
    ManifestSink.compact(spark, dir)
    ManifestSink.append(Seq(10L).toDF("k"), dir)
    intercept[StreamingQueryException] {
      drain(dir, ckpt, sink, Map("ignoreDeletes" -> "true"))
    }
    drain(dir, ckpt, sink, Map("ignoreChanges" -> "true"))
    // the compaction re-emitted the rewritten survivors (1, 3, 9) —
    // exactly the documented ignoreChanges re-emission
    assert(ids(sink) === Seq(1L, 1L, 2L, 3L, 3L, 9L, 9L, 10L))
  }

  test("chained: a bronze table streams into a managed view downstream") {
    import graft.sinks.{AggMatView, IncrementalAgg}
    val bronze = table("bz")
    val silver = table("ag")
    val view = table("vw")
    val ckpt = Files.createTempDirectory("mstreamvw").toString
    def drainView(): Unit = {
      val q = spark.readStream.format("manifest-stream")
        .option("path", bronze).option("maxVersionsPerTrigger", "1")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          AggMatView.absorbEpoch(spark, b, id, silver, view,
            Seq("k"), "v")
          ()
        }
        .start()
      q.awaitTermination(120000L)
    }
    def viewRows() = IncrementalAgg.present(
        AggMatView.read(spark, view), Seq("k"))
      .collect().map(_.toString).sorted.toSeq
    def direct() = IncrementalAgg.present(IncrementalAgg.aggregate(
        ManifestSink.read(spark, bronze), Seq("k"), "v"), Seq("k"))
      .collect().map(_.toString).sorted.toSeq
    ManifestSink.append(Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"), bronze)
    ManifestSink.append(Seq(("a", 3.0)).toDF("k", "v"), bronze)
    drainView()
    assert(viewRows() === direct())
    ManifestSink.append(Seq(("c", 5.0), ("b", 1.5)).toDF("k", "v"), bronze)
    drainView()
    assert(viewRows() === direct())
    // replay: no epochs, no commits anywhere down the chain
    val (vb, vv) = (ManifestSink.version(spark, silver),
      ManifestSink.version(spark, view))
    drainView()
    assert(ManifestSink.version(spark, silver) === vb)
    assert(ManifestSink.version(spark, view) === vv)
  }

  test("cdc mode streams inserts, updates, deletes; maintenance is silent") {
    val dir = table("cdc")
    val sink = table("cdcsink")
    val ckpt = Files.createTempDirectory("mstreamcdc").toString
    val opts = Map("mode" -> "cdc", "keys" -> "k")
    def changes(): Seq[(Long, String, String)] =
      ManifestSink.read(spark, sink)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sorted.toSeq
    ManifestSink.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    drain(dir, ckpt, sink, opts)
    assert(changes() === Seq((1L, "a", "insert"), (2L, "b", "insert")))
    // an upsert window becomes update + insert rows
    ManifestSink.mergeOnRead(Seq((2L, "B"), (3L, "c")).toDF("k", "v"),
      dir, Seq("k"))
    drain(dir, ckpt, sink, opts)
    assert(changes() === Seq((1L, "a", "insert"), (2L, "B", "update"),
      (2L, "b", "insert"), (3L, "c", "insert")))
    // a MoR delete window becomes a delete row — no refusal in cdc mode
    ManifestSink.deleteRangeMergeOnRead(spark, dir, "k", Some(1L), Some(1L))
    drain(dir, ckpt, sink, opts)
    assert(changes().contains((1L, "a", "delete")))
    // compaction changes the layout, not the content: the CDC stream is
    // SILENT through table maintenance (empty diff, no sink commit)
    val n = changes().size
    ManifestSink.compact(spark, dir)
    val vs = ManifestSink.version(spark, sink)
    drain(dir, ckpt, sink, opts)
    assert(changes().size === n)
    assert(ManifestSink.version(spark, sink) === vs)
  }

  test("upsert windows stream the fresh rows under ignoreDeletes") {
    val dir = table("ups")
    val sink = table("upssink")
    val ckpt = Files.createTempDirectory("mstreamups").toString
    ManifestSink.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    drain(dir, ckpt, sink)
    ManifestSink.mergeOnRead(Seq((2L, "B"), (3L, "c")).toDF("k", "v"),
      dir, Seq("k"))
    drain(dir, ckpt, sink, Map("ignoreDeletes" -> "true"))
    val got = ManifestSink.read(spark, sink)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got === Seq((1L, "a"), (2L, "B"), (2L, "b"), (3L, "c")))
  }
}
