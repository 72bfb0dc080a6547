package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.ViewRewrite

/** AggMatView's lifecycle contract: atomic header-tracked folds that
  * match a from-scratch recompute, retraction windows recomputing, no-op
  * refreshes, and serve() registering exactly the absorbed snapshot. */
class AggMatViewSpec extends SparkSpec {
  import spark.implicits._

  private def freshDirs(tag: String): (String, String) = {
    val root = java.nio.file.Files
      .createTempDirectory(s"graft_amv_$tag").toString
    (root + "/base", root + "/view")
  }
  private val keys = Seq("k")

  private def stateMap(viewDir: String) =
    AggMatView.read(spark, viewDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2), r.getDouble(3), r.getDouble(4)))
      .toMap

  test("folds track a from-scratch recompute across appends; no-op " +
      "refresh is silent") {
    val (base, view) = freshDirs("fold")
    ManifestSink.append(
      Seq(("a", 1.0), ("a", 2.0), ("b", 5.0)).toDF("k", "v"), base)
    AggMatView.create(spark, view, base, keys, "v")
    ManifestSink.append(Seq(("a", 10.0), ("c", 7.0)).toDF("k", "v"), base)
    val (v1, f1) = AggMatView.refresh(spark, view, base, keys, "v")
    assert(f1)
    val want = IncrementalAgg.aggregate(
      ManifestSink.read(spark, base), keys, "v")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDecimal(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(stateMap(view) === want)
    // no new base commits → refresh is a version-preserving no-op
    val (v2, f2) = AggMatView.refresh(spark, view, base, keys, "v")
    assert(f2 && v2 === v1)
  }

  test("a retraction window recomputes, then folds again") {
    val (base, view) = freshDirs("retract")
    ManifestSink.append(
      Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("k", "v"), base)
    AggMatView.create(spark, view, base, keys, "v")
    ManifestSink.deleteKeysMergeOnRead(
      Seq(Tuple1("b")).toDF("k"), base, keys)
    val (_, folded) = AggMatView.refresh(spark, view, base, keys, "v")
    assert(!folded, "a MoR delete window must recompute")
    assert(stateMap(view).keySet === Set("a"))
    // Note: post-delete snapshots are tombstoned — serve() would refuse
    // (assembled reads are not bare scans), which is the correct shape
    intercept[IllegalArgumentException] {
      AggMatView.serve(spark, view, base, keys, "v")
    }
  }

  test("the sums view folds deletes and upserts instead of recomputing") {
    val (base, view) = freshDirs("sums")
    def direct() = IncrementalAgg.presentSums(IncrementalAgg
        .aggregateSums(ManifestSink.read(spark, base), keys, "v"), keys)
      .collect().map(_.toString).sorted.toSeq
    def state() = IncrementalAgg.presentSums(
        AggMatView.read(spark, view), keys)
      .collect().map(_.toString).sorted.toSeq
    ManifestSink.append(
      Seq(("a", 1.0), ("b", 2.0), ("b", 3.0)).toDF("k", "v"), base)
    AggMatView.createSums(spark, view, base, keys, "v")
    assert(state() === direct())
    // a MoR delete window FOLDS for the subtractable state (the bounded
    // state's refresh recomputes here) and the vanished group drops
    ManifestSink.deleteKeysMergeOnRead(
      Seq(Tuple1("b")).toDF("k"), base, keys)
    val (_, m1) = AggMatView.refreshSums(spark, view, base, keys, "v")
    assert(m1 === "retract_fold")
    assert(state() === direct())
    // a MoR upsert window folds too; a fresh probe is silent
    ManifestSink.mergeOnRead(
      Seq(("a", 10.0), ("c", 7.0)).toDF("k", "v"), base, keys)
    val (v2, m2) = AggMatView.refreshSums(spark, view, base, keys, "v")
    assert(m2 === "retract_fold")
    assert(state() === direct())
    val (v3, m3) = AggMatView.refreshSums(spark, view, base, keys, "v")
    assert(m3 === "fresh" && v3 === v2)
  }

  test("serve registers the absorbed snapshot; a base commit after " +
      "serve structurally stops the rewrite") {
    val (base, view) = freshDirs("serve")
    ManifestSink.append(
      Seq(("a", 1.5), ("b", 2.5)).toDF("k", "v"), base)
    AggMatView.create(spark, view, base, keys, "v")
    AggMatView.serve(spark, view, base, keys, "v")
    ViewRewrite.install(spark)
    try {
      def agg() = ManifestSink.read(spark, base).groupBy($"k")
        .agg(count(lit(1)).as("n"), max($"v").as("mx"))
      val q = agg()
      val plan = q.queryExecution.executedPlan.toString
      assert(plan.contains("/view") && !plan.contains("/base"))
      // base advances → the served registration no longer matches
      ManifestSink.append(Seq(("c", 9.0)).toDF("k", "v"), base)
      val q2 = agg()
      val plan2 = q2.queryExecution.executedPlan.toString
      assert(plan2.contains("/base"))
      assert(q2.collect().length === 3)
      // refresh + serve again → served again, with the new row folded
      val (_, folded) = AggMatView.refresh(spark, view, base, keys, "v")
      assert(folded)
      AggMatView.serve(spark, view, base, keys, "v")
      val q3 = agg()
      assert(q3.queryExecution.executedPlan.toString.contains("/view"))
      assert(q3.collect().length === 3)
    } finally ViewRewrite.clear()
  }

  test("freshness is metadata-exact: delta rows, foldability, and the " +
      "non-foldable window's None") {
    val (base, view) = freshDirs("freshness")
    ManifestSink.append(
      Seq(("a", 1.0), ("b", 2.0)).toDF("k", "v"), base)
    AggMatView.create(spark, view, base, keys, "v")
    val f0 = AggMatView.freshness(spark, view, base)
    assert(f0.behind === 0L && f0.deltaRows === Some(0L) && f0.foldable)
    ManifestSink.append(
      Seq(("c", 3.0), ("d", 4.0), ("e", 5.0)).toDF("k", "v"), base)
    val f1 = AggMatView.freshness(spark, view, base)
    assert(f1.behind === 1L && f1.deltaRows === Some(3L) && f1.foldable)
    // a retraction in the window: not foldable, delta cost unknowable
    ManifestSink.deleteKeysMergeOnRead(
      Seq(Tuple1("a")).toDF("k"), base, keys)
    val f2 = AggMatView.freshness(spark, view, base)
    assert(f2.behind === 2L && f2.deltaRows === None && !f2.foldable)
  }

  test("absorbEpoch: replayed epochs cannot double-fold, and a real " +
      "stream's end state equals the direct aggregate") {
    val (base, view) = freshDirs("epoch")
    def batch(i: Int) =
      Seq((s"k${i % 2}", i.toDouble), (s"k${i % 3}", i * 10.0))
        .toDF("k", "v")
    // epochs 0..3 with replays of 1 (pre- and post-later-epochs) — the
    // q101 replay pattern lifted to the composed base+view maintenance
    AggMatView.absorbEpoch(spark, batch(0), 0L, base, view, keys, "v")
    AggMatView.absorbEpoch(spark, batch(1), 1L, base, view, keys, "v")
    AggMatView.absorbEpoch(spark, batch(1), 1L, base, view, keys, "v")
    AggMatView.absorbEpoch(spark, batch(2), 2L, base, view, keys, "v")
    AggMatView.absorbEpoch(spark, batch(1), 1L, base, view, keys, "v")
    AggMatView.absorbEpoch(spark, batch(3), 3L, base, view, keys, "v")
    val direct = IncrementalAgg.aggregate(
      ManifestSink.read(spark, base), keys, "v")
      .collect().map(_.toString).sorted
    assert(AggMatView.read(spark, view)
      .collect().map(_.toString).sorted === direct)
    // and the base holds each epoch exactly once
    assert(ManifestSink.read(spark, base).count() === 8L)

    // a REAL stream drives the same body through foreachBatch
    val (sBase, sView) = freshDirs("epoch_stream")
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_amv_src").toString
    (0 until 6).foreach { i =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(srcDir, s"f$i.csv"),
        s"k${i % 3},${i * 1.5}\n".getBytes("UTF-8"))
    }
    val ckpt = java.nio.file.Files
      .createTempDirectory("graft_amv_ckpt").toString
    import org.apache.spark.sql.types._
    def run(): Unit = {
      val q = spark.readStream
        .schema(StructType(Seq(StructField("k", StringType),
          StructField("v", DoubleType))))
        .option("maxFilesPerTrigger", 1)
        .csv(srcDir)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, id: Long) =>
          AggMatView.absorbEpoch(spark, b, id, sBase, sView, keys, "v")
          ()
        }
        .start()
      q.awaitTermination(120000L)
    }
    run()
    val want = IncrementalAgg.aggregate(
      ManifestSink.read(spark, sBase), keys, "v")
      .collect().map(_.toString).sorted
    assert(AggMatView.read(spark, sView)
      .collect().map(_.toString).sorted === want)
    assert(ManifestSink.read(spark, sBase).count() === 6L)
    val vAfter = ManifestSink.version(spark, sView)
    // full checkpoint replay: no new files → no epochs → total silence
    run()
    assert(ManifestSink.version(spark, sView) === vAfter)
    assert(ManifestSink.read(spark, sBase).count() === 6L)
  }

  test("create refuses an existing view; refresh refuses a missing one") {
    val (base, view) = freshDirs("refuse")
    ManifestSink.append(Seq(("a", 1.0)).toDF("k", "v"), base)
    AggMatView.create(spark, view, base, keys, "v")
    intercept[IllegalArgumentException] {
      AggMatView.create(spark, view, base, keys, "v")
    }
    intercept[IllegalArgumentException] {
      AggMatView.refresh(spark, view + "_nope", base, keys, "v")
    }
  }
}
