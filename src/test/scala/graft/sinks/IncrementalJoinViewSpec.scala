package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The incremental join view's contract: every maintained state equals
  * the full join of the current source snapshots — through append-only
  * folds (O(delta)), no-op windows, empty-intersection deltas, and the
  * recompute path a retraction forces — and the single-table
  * incremental views stack on top of it. */
class IncrementalJoinViewSpec extends SparkSpec {

  private def dirs(): (String, String, String) = (
    Files.createTempDirectory("ijv_l").toString + "/l",
    Files.createTempDirectory("ijv_r").toString + "/r",
    Files.createTempDirectory("ijv_v").toString + "/v")

  private def left(rows: (Int, String)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("k", "lv")
  }
  private def right(rows: (Int, Long)*): DataFrame = {
    import spark.implicits._
    rows.toSeq.toDF("k", "rv")
  }

  private def content(viewDir: String): Set[(Int, String, Long)] =
    IncrementalJoinView.read(spark, viewDir)
      .select(col("k"), col("lv"), col("rv"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSet

  private def fullJoin(l: String, r: String): Set[(Int, String, Long)] =
    ManifestSink.read(spark, l).join(ManifestSink.read(spark, r), Seq("k"))
      .select(col("k"), col("lv"), col("rv"))
      .collect().map(r0 => (r0.getInt(0), r0.getString(1), r0.getLong(2)))
      .toSet

  test("append-only folds track the full join; no-op window is silent") {
    val (l, r, v) = dirs()
    ManifestSink.append(left(1 -> "a", 2 -> "b"), l)
    ManifestSink.append(right(1 -> 10L, 3 -> 30L), r)
    IncrementalJoinView.create(spark, v, l, r, "k")
    assert(content(v) === Set((1, "a", 10L)))
    assert(IncrementalJoinView.sourceVersions(spark, v) === (0L, 0L))

    // no-op: nothing changed, nothing committed
    val (v0, folded0) = IncrementalJoinView.refresh(spark, v, l, r, "k")
    assert(folded0 && v0 === ManifestSink.version(spark, v))
    assert(ManifestSink.version(spark, v) === 0L)

    // ΔL joins old AND new right rows; ΔR joins old left; ΔL⋈ΔR once
    ManifestSink.append(left(3 -> "c", 4 -> "d"), l)
    ManifestSink.append(right(2 -> 20L, 4 -> 40L), r)
    val (_, folded1) = IncrementalJoinView.refresh(spark, v, l, r, "k")
    assert(folded1)
    assert(content(v) === fullJoin(l, r))
    assert(content(v) === Set((1, "a", 10L), (2, "b", 20L),
      (3, "c", 30L), (4, "d", 40L)))
    assert(IncrementalJoinView.sourceVersions(spark, v) === (1L, 1L))
    // the fold landed as an APPEND on the view (delta rows only)
    val kinds = ManifestSink.history(spark, v)
      .select("kind").collect().map(_.getString(0)).toSet
    assert(kinds === Set("create", "append"))
  }

  test("empty-intersection delta advances positions without doubling") {
    val (l, r, v) = dirs()
    ManifestSink.append(left(1 -> "a"), l)
    ManifestSink.append(right(1 -> 10L), r)
    IncrementalJoinView.create(spark, v, l, r, "k")

    // this delta matches nothing — positions must still advance
    ManifestSink.append(left(7 -> "g"), l)
    val (_, f1) = IncrementalJoinView.refresh(spark, v, l, r, "k")
    assert(f1)
    assert(IncrementalJoinView.sourceVersions(spark, v) === (1L, 0L))
    assert(content(v) === Set((1, "a", 10L)))

    // now the other side matches it: the fold must see k=7 exactly once
    // (a position that failed to advance above would re-join ΔL here
    // and double nothing visibly — but a LATER L append would double)
    ManifestSink.append(right(7 -> 70L), r)
    ManifestSink.append(left(8 -> "h"), l)
    ManifestSink.append(right(8 -> 80L), r)
    val (_, f2) = IncrementalJoinView.refresh(spark, v, l, r, "k")
    assert(f2)
    assert(content(v) === fullJoin(l, r))
    assert(content(v) === Set((1, "a", 10L), (7, "g", 70L), (8, "h", 80L)))
  }

  test("a retraction in the window recomputes, then folds again") {
    val (l, r, v) = dirs()
    import spark.implicits._
    ManifestSink.append(left(1 -> "a", 2 -> "b", 3 -> "c"), l)
    ManifestSink.append(right(1 -> 10L, 2 -> 20L, 3 -> 30L), r)
    IncrementalJoinView.create(spark, v, l, r, "k")

    // merge-on-read delete on the left: a retraction no fold absorbs
    ManifestSink.deleteKeysMergeOnRead(Seq(2).toDF("k"), l, Seq("k"))
    val (_, folded) = IncrementalJoinView.refresh(spark, v, l, r, "k")
    assert(!folded, "a MoR delete window must take the recompute path")
    assert(content(v) === fullJoin(l, r))
    assert(content(v) === Set((1, "a", 10L), (3, "c", 30L)))

    // the window AFTER the recompute is append-only: folds again
    ManifestSink.append(right(4 -> 40L), r)
    ManifestSink.append(left(4 -> "d"), l)
    val (_, folded2) = IncrementalJoinView.refresh(spark, v, l, r, "k")
    assert(folded2, "append-only window after a recompute must fold")
    assert(content(v) === fullJoin(l, r))
  }

  test("shared non-key columns are refused loudly") {
    val (l, r, v) = dirs()
    import spark.implicits._
    ManifestSink.append(Seq((1, "a")).toDF("k", "shared"), l)
    ManifestSink.append(Seq((1, "b")).toDF("k", "shared"), r)
    val e = intercept[IllegalArgumentException] {
      IncrementalJoinView.create(spark, v, l, r, "k")
    }
    assert(e.getMessage.contains("shared"))
  }

  test("addedRows sizes the delta from metadata alone") {
    val (l, _, _) = dirs()
    val v0 = ManifestSink.append(left(1 -> "a", 2 -> "b"), l)
    val v1 = ManifestSink.append(left(3 -> "c"), l)
    assert(ManifestSink.addedRows(spark, l, -1L, v0) === Some(2L))
    assert(ManifestSink.addedRows(spark, l, v0, v1) === Some(1L))
    assert(ManifestSink.addedRows(spark, l, v0, v0) === Some(0L))
    // a tombstone-only commit adds zero DATA rows to the delta count
    import spark.implicits._
    val v2Dir = l // MoR delete commits a tombstone entry
    ManifestSink.deleteKeysMergeOnRead(Seq(1).toDF("k"), v2Dir, Seq("k"))
    val v2 = ManifestSink.version(spark, l)
    assert(ManifestSink.addedRows(spark, l, v1, v2) === Some(0L))
  }

  test("disabling the broadcast hint (broadcastRows = 0) stays exact") {
    val (l, r, v) = dirs()
    ManifestSink.append(left(1 -> "a", 2 -> "b"), l)
    ManifestSink.append(right(1 -> 10L, 2 -> 20L), r)
    IncrementalJoinView.create(spark, v, l, r, "k")
    ManifestSink.append(left(3 -> "c"), l)
    ManifestSink.append(right(3 -> 30L), r)
    val (_, folded) =
      IncrementalJoinView.refresh(spark, v, l, r, "k", broadcastRows = 0L)
    assert(folded)
    assert(content(v) === fullJoin(l, r))
  }

  test("IncrementalAgg stacks on the view: agg-over-join, both levels O(delta)") {
    val (l, r, v) = dirs()
    ManifestSink.append(left(1 -> "x", 2 -> "y"), l)
    ManifestSink.append(right(1 -> 10L, 2 -> 20L), r)
    IncrementalJoinView.create(spark, v, l, r, "k")
    val keys = Seq("lv")
    val vv0 = ManifestSink.version(spark, v)
    var state = IncrementalAgg.aggregate(
      ManifestSink.changes(spark, v, -1L, vv0), keys, "rv")
    var vPos = vv0

    // two refresh cycles; the OUTER view folds O(delta) view batches
    ManifestSink.append(left(3 -> "x"), l)
    ManifestSink.append(right(3 -> 30L), r)
    IncrementalJoinView.refresh(spark, v, l, r, "k")
    ManifestSink.append(right(4 -> 40L), r)
    ManifestSink.append(left(4 -> "y"), l)
    IncrementalJoinView.refresh(spark, v, l, r, "k")

    val vvN = ManifestSink.version(spark, v)
    val (s2, foldedAgg) = IncrementalAgg.refreshOrRecompute(spark, state,
      v, vPos, vvN, keys, "rv")
    state = s2; vPos = vvN
    assert(foldedAgg, "view history is append-only — the agg must fold")
    val got = IncrementalAgg.present(state, keys)
      .select(col("lv"), col("n"), col("sum_value"))
      .collect().map(r0 => (r0.getString(0), r0.getLong(1), r0.getDouble(2)))
      .toSet
    assert(got === Set(("x", 2L, 40.0), ("y", 2L, 60.0)))
  }

  test("absorbEpoch: replayed epochs cannot double-fold; dimension " +
      "commits between epochs are absorbed in the same call") {
    val (l, r, v) = dirs()
    ManifestSink.append(right(0 -> 100L, 1 -> 200L, 2 -> 300L), r)
    def epoch(i: Int) = left(i % 3 -> s"e$i")
    // epochs with replays of 1, pre- and post-later-epochs (q101's
    // replay pattern lifted to the composed base+join-view maintenance)
    IncrementalJoinView.absorbEpoch(spark, epoch(0), 0L, l, v, r, "k")
    IncrementalJoinView.absorbEpoch(spark, epoch(1), 1L, l, v, r, "k")
    IncrementalJoinView.absorbEpoch(spark, epoch(1), 1L, l, v, r, "k")
    // a dimension writer lands between epochs: the next epoch's fold
    // must absorb BOTH the new epoch and the new dimension rows
    ManifestSink.append(right(3 -> 400L), r)
    val (_, folded) =
      IncrementalJoinView.absorbEpoch(spark, epoch(2), 2L, l, v, r, "k")
    assert(folded, "append-only windows on both sides must fold")
    IncrementalJoinView.absorbEpoch(spark, epoch(1), 1L, l, v, r, "k")
    IncrementalJoinView.absorbEpoch(spark, epoch(3), 3L, l, v, r, "k")
    assert(content(v) === fullJoin(l, r))
    // the left base holds each epoch exactly once
    assert(ManifestSink.read(spark, l).count() === 4L)

    // a REAL AvailableNow stream drives the same body via foreachBatch
    val (sl, sr, sv) = dirs()
    ManifestSink.append(right(0 -> 10L, 1 -> 20L, 2 -> 30L), sr)
    val srcDir = Files.createTempDirectory("ijv_src").toString
    (0 until 5).foreach { i =>
      Files.write(java.nio.file.Paths.get(srcDir, s"f$i.csv"),
        s"${i % 3},s$i\n".getBytes("UTF-8"))
    }
    val ckpt = Files.createTempDirectory("ijv_ckpt").toString
    import org.apache.spark.sql.types._
    def run(): Unit = {
      val q = spark.readStream
        .schema(StructType(Seq(StructField("k", IntegerType),
          StructField("lv", StringType))))
        .option("maxFilesPerTrigger", 1)
        .csv(srcDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          IncrementalJoinView.absorbEpoch(spark, b, id, sl, sv, sr, "k")
          ()
        }
        .start()
      q.awaitTermination(120000L)
    }
    run()
    assert(content(sv) === fullJoin(sl, sr))
    assert(ManifestSink.read(spark, sl).count() === 5L)
    val vAfter = ManifestSink.version(spark, sv)
    // full checkpoint replay: no new files → no epochs → total silence
    run()
    assert(ManifestSink.version(spark, sv) === vAfter)
    assert(ManifestSink.read(spark, sl).count() === 5L)
  }
}
