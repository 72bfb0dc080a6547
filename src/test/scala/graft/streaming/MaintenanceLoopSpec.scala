package graft.streaming

import java.nio.file.{Files, Paths}

import graft.{GraftConfig, SparkSpec}
import graft.sinks.{AggMatView, Maintenance, MaintenancePolicy, ManifestSink}

/** In-loop maintenance (r12 verdict #2): a live exactly-once stream with
  * a [[MaintenancePolicy]] attached must CONVERGE — dribble entries
  * bounded while the stream runs, re-plan silent afterwards — and the
  * exactly-once epoch marker must survive the maintenance commits a
  * replay crosses (the header carry-forward + rebase contract, here
  * exercised under the real foreachBatch instead of by hand). */
class MaintenanceLoopSpec extends SparkSpec {

  private def line(i: Int): String =
    f"""{"meta":{"dt":"2026-01-08T22:${i}%02d:00Z"},"type":"edit",""" +
      f""""title":"T$i%02d","title_url":"u","user":"Eve","bot":false,""" +
      """"length":{"old":1,"new":2},"wiki":"enwiki"}"""

  /** One file per epoch with pinned, strictly increasing mtimes (the
    * file source orders by mtime; a tight write loop would tie). */
  private def writeEpochFiles(srcDir: String, n: Int): Unit = {
    val mtimeBase = System.currentTimeMillis() - 600000L
    (0 until n).foreach { i =>
      val f = Files.write(Paths.get(srcDir, f"b$i%02d.jsonl"),
        line(i).getBytes("UTF-8"))
      Files.setLastModifiedTime(f,
        java.nio.file.attribute.FileTime.fromMillis(mtimeBase + i * 1000L))
    }
  }

  test("dribble-append stream with a policy converges while running: " +
      "entry count bounded in-loop, re-plan silent at the end") {
    val srcDir = Files.createTempDirectory("mloop_src").toString
    val sinkDir = Files.createTempDirectory("mloop_sink").toString + "/t"
    val ckpt = Files.createTempDirectory("mloop_ckpt").toString
    writeEpochFiles(srcDir, 24)
    val policy = MaintenancePolicy(everyEpochs = 6, minRows = 1000L)
    val q = WikiStream.startExactlyOnce(spark, srcDir, sinkDir, ckpt,
      GraftConfig(dbMaxEvents = 100000), trigger = None,
      maxFilesPerTrigger = 1, maintenance = policy)
    try q.processAllAvailable() finally q.stop()

    // no data harmed: all 24 one-event epochs, exactly once
    val titles = ManifestSink.read(spark, sinkDir)
      .select("title").collect().map(_.getString(0)).toSeq
    assert(titles.sorted === (0 until 24).map(i => f"T$i%02d"))

    // BOUNDED entries, asserted BEFORE any manual maintenance: without
    // the in-loop cycles a 24-epoch dribble leaves 24 entries; with
    // everyEpochs = 6 at most one compacted entry plus the tail dribble
    // can remain
    val (_, dataEntries) = ManifestSink.tombstoneDebt(spark, sinkDir)
    assert(dataEntries <= 7,
      s"in-loop maintenance never compacted: $dataEntries entries")
    // and the maintenance commits happened DURING the stream: more
    // commits than the 24 appends alone would produce
    assert(ManifestSink.version(spark, sinkDir) >= 24L)

    // convergence: one manual cycle absorbs whatever tail dribble the
    // cadence left; the RE-plan is then silent (nothing fired, version
    // parked)
    Maintenance.runCycle(spark, sinkDir, policy)
    val v = ManifestSink.version(spark, sinkDir)
    assert(Maintenance.runCycle(spark, sinkDir, policy) === Nil)
    assert(ManifestSink.version(spark, sinkDir) === v)
    val (_, after) = ManifestSink.tombstoneDebt(spark, sinkDir)
    assert(after === 1, s"converged table should be one entry, got $after")
  }

  test("checkpoint replay across maintenance commits stays a no-op: " +
      "the epoch marker survives the rewrites") {
    val srcDir = Files.createTempDirectory("mrep_src").toString
    val sinkDir = Files.createTempDirectory("mrep_sink").toString + "/t"
    val ckpt1 = Files.createTempDirectory("mrep_ckpt1").toString
    writeEpochFiles(srcDir, 8)
    val policy = MaintenancePolicy(everyEpochs = 3, minRows = 1000L)
    val q1 = WikiStream.startExactlyOnce(spark, srcDir, sinkDir, ckpt1,
      GraftConfig(dbMaxEvents = 100000), trigger = None,
      maxFilesPerTrigger = 1, maintenance = policy)
    try q1.processAllAvailable() finally q1.stop()
    // land one more maintenance commit AFTER the last fold, so the
    // replay below crosses it for every epoch
    Maintenance.runCycle(spark, sinkDir, policy)
    val vBefore = ManifestSink.version(spark, sinkDir)
    val marker = ManifestSink.lastBatchId(spark, sinkDir)
    assert(marker >= 7L)

    // a FRESH checkpoint re-delivers every epoch (at-least-once): each
    // replayed fold must skip off the carried-forward marker — across
    // however many compaction commits the in-loop cadence landed
    val ckpt2 = Files.createTempDirectory("mrep_ckpt2").toString
    val q2 = WikiStream.startExactlyOnce(spark, srcDir, sinkDir, ckpt2,
      GraftConfig(dbMaxEvents = 100000), trigger = None,
      maxFilesPerTrigger = 1, maintenance = policy)
    try q2.processAllAvailable() finally q2.stop()
    assert(ManifestSink.version(spark, sinkDir) === vBefore,
      "replayed epochs committed something")
    val titles = ManifestSink.read(spark, sinkDir)
      .select("title").collect().map(_.getString(0)).toSeq
    assert(titles.sorted === (0 until 8).map(i => f"T$i%02d"))
  }

  test("purge_debt cure: tombstone debt from MoR upserts converges " +
      "under the cycle, content byte-preserved, at most one rewrite") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("mpurge").toString + "/t"
    val rows = (0 until 400).map(i => (i.toLong, i * 3L))
    ManifestSink.append(rows.toDF("k", "v"), dir)
    // six MoR upserts = six read-path tombstones (plus data entries)
    (0 until 6).foreach { u =>
      ManifestSink.mergeOnRead(
        Seq(((u * 10).toLong, -1L * u)).toDF("k", "v"), dir, Seq("k"))
    }
    val (tombs, _) = ManifestSink.tombstoneDebt(spark, dir)
    assert(tombs === 6)
    val want = ManifestSink.read(spark, dir)
      .agg(count(lit(1)), sum($"v")).head()
    // policy with maxTombstones = 4: the cycle must pick the FULL
    // compact (purge subsumes compact_small — exactly one rewrite)
    val policy = MaintenancePolicy(everyEpochs = 1, minRows = 1000L,
      maxTombstones = 4)
    assert(Maintenance.runCycle(spark, dir, policy) === Seq("purge_debt"))
    val (tombsAfter, dataAfter) = ManifestSink.tombstoneDebt(spark, dir)
    assert(tombsAfter === 0 && dataAfter === 1)
    val got = ManifestSink.read(spark, dir)
      .agg(count(lit(1)), sum($"v")).head()
    assert(got === want, "purge must change layout, never content")
    // converged: the re-plan is silent
    assert(Maintenance.runCycle(spark, dir, policy) === Nil)
  }

  test("absorbEpoch with a policy: base table bounded, view content " +
      "survives the recompute a base rewrite forces") {
    import spark.implicits._
    val root = Files.createTempDirectory("mview").toString
    val (base, view) = (s"$root/base", s"$root/view")
    val policy = MaintenancePolicy(everyEpochs = 4, minRows = 1000L)
    (0 until 12).foreach { e =>
      val batch = Seq((s"k${e % 3}", e.toLong), ("k9", 1L))
        .toDF("k", "w")
      AggMatView.absorbEpoch(spark, batch, e.toLong, base, view,
        Seq("k"), "w", policy)
    }
    val (_, dataEntries) = ManifestSink.tombstoneDebt(spark, base)
    assert(dataEntries <= 5,
      s"base never compacted under the cadence: $dataEntries entries")
    // the view's content equals a from-scratch recompute of the base —
    // across however many fold/recompute transitions the maintenance
    // commits forced
    val got = AggMatView.present(spark, view, Seq("k"))
      .orderBy($"k").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = ManifestSink.read(spark, base)
      .groupBy($"k")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum($"w").cast("double")
          .as("sum_value"))
      .orderBy($"k").collect().map(r =>
        (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
    // re-anchor the view onto the compacted base (the one recompute a
    // base rewrite forces, paid here explicitly) …
    AggMatView.refresh(spark, view, base, Seq("k"), "w")
    // … then a replayed epoch across the maintenance commits parks BOTH
    // versions: the base fold skips off the carried marker, and the
    // anchored view sees equal positions
    val (vb, vv) = (ManifestSink.version(spark, base),
      ManifestSink.version(spark, view))
    AggMatView.absorbEpoch(spark,
      Seq(("k0", 999L)).toDF("k", "w"), 11L, base, view,
      Seq("k"), "w", policy)
    assert(ManifestSink.version(spark, base) === vb)
    assert(ManifestSink.version(spark, view) === vv)
  }

  test("opt-in vacuum in the cycle reclaims history but never a " +
      "catalog pin; a read past the horizon fails with the retention " +
      "story; off by default") {
    import graft.sinks.Catalog
    import spark.implicits._
    val root = Files.createTempDirectory("mvac").toString
    val t = root + "/t"
    val cat = root + "/cat"
    val v0 = ManifestSink.append(Seq(1L, 2L).toDF("v"), t)
    Catalog.publish(spark, cat, Map("t" -> (t, v0)))
    (0 until 6).foreach(i => ManifestSink.append(Seq(10L + i).toDF("v"), t))

    // DEFAULT policy: the cycle compacts the dribble but deletes no
    // history — every version since genesis still time-travels
    val polOff = MaintenancePolicy(everyEpochs = 1, minRows = 1000L)
    val off = Maintenance.runCycle(spark, t, polOff)
    assert(off.nonEmpty && !off.contains("vacuum"))
    (0L to ManifestSink.version(spark, t)).foreach { v =>
      ManifestSink.readAt(spark, t, v).collect()
    }

    // more dribble lands, then OPT-IN: keep only the head version,
    // protect the catalog's published pins. The cycle cures (compact)
    // and the vacuum that follows reclaims the replaced directories in
    // the SAME cycle — the "after the cure" ordering.
    (0 until 3).foreach(i => ManifestSink.append(Seq(20L + i).toDF("v"), t))
    val pol = polOff.copy(vacuumKeepVersions = 1,
      vacuumProtectCatalogs = Seq(cat))
    val acts = Maintenance.runCycle(spark, t, pol)
    assert(acts.contains("vacuum"), s"vacuum did not fire: $acts")
    assert(acts.size === 2, s"cure should fire in the same cycle: $acts")
    // the PINNED genesis version survives with its data …
    assert(ManifestSink.readAt(spark, t, v0)
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    assert(Catalog.readTable(spark, cat, "t")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
    // … an UNPINNED old version is gone, and says why
    val e = intercept[IllegalStateException] {
      ManifestSink.readAt(spark, t, v0 + 1).collect()
    }
    assert(e.getMessage.contains("retention horizon"))
    // the head is untouched
    assert(ManifestSink.read(spark, t)
      .collect().map(_.getLong(0)).toSet ===
      (Set(1L, 2L) ++ (0 until 6).map(10L + _) ++ (0 until 3).map(20L + _)))
    // idempotent: nothing left to reclaim on the next cycle
    assert(!Maintenance.runCycle(spark, t, pol).contains("vacuum"))
  }
}
