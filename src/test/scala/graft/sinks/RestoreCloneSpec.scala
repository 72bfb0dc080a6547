package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

class RestoreCloneSpec extends SparkSpec {
  import spark.implicits._

  private def vals(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.collect().map(_.getLong(0)).toSet

  test("restore rolls the snapshot back metadata-only; bad versions " +
      "stay time-travel readable, vacuum reclaims them") {
    val dir = Files.createTempDirectory("restore").toString + "/t"
    val v0 = ManifestSink.append(Seq(1L, 2L).toDF("v"), dir)
    ManifestSink.append(Seq(3L).toDF("v"), dir) // good append
    ManifestSink.append(Seq(999L).toDF("v"), dir) // the bad batch
    val vr = ManifestSink.restore(spark, dir, 1L)
    assert(vr === 3L) // restore is a NEW commit, not a pointer rewind
    assert(vals(ManifestSink.read(spark, dir)) === Set(1L, 2L, 3L))
    // the mistake is still auditable (and a mistaken restore undoable)
    assert(vals(ManifestSink.readAt(spark, dir, 2L)) === Set(1L, 2L, 3L, 999L))
    // the table keeps evolving past the restore
    ManifestSink.append(Seq(4L).toDF("v"), dir)
    assert(vals(ManifestSink.read(spark, dir)) === Set(1L, 2L, 3L, 4L))
    // a vacuum retaining the bad version's manifest reclaims nothing
    // (the bad batch is still referenced by the time-travel window)...
    assert(ManifestSink.vacuum(spark, dir, keepVersions = 5).isEmpty)
    assert(vals(ManifestSink.readAt(spark, dir, v0)) === Set(1L, 2L))
    // ...and collapsing retention to the current version reclaims
    // exactly the bad batch's dir (trading away the audit window)
    assert(ManifestSink.vacuum(spark, dir).size === 1)
    assert(vals(ManifestSink.read(spark, dir)) === Set(1L, 2L, 3L, 4L))
  }

  test("restore carries progress markers forward: a folded batch does " +
      "not double-apply after rollback") {
    val dir = Files.createTempDirectory("restoreeo").toString + "/t"
    ManifestSink.append(Seq(1L).toDF("v"), dir)
    val vb = ManifestSink.appendOnce(Seq(10L).toDF("v"), dir, batchId = 7L)
    assert(vb === 1L) // batch 7 really landed
    ManifestSink.append(Seq(999L).toDF("v"), dir)
    val vr = ManifestSink.restore(spark, dir, 0L)
    // the rollback dropped batch 7's DATA, but its exactly-once marker
    // survives: a replay of batch 7 must still be skipped (the marker is
    // ingest-lineage state, not table content)
    assert(ManifestSink.appendOnce(
      Seq(10L).toDF("v"), dir, batchId = 7L) === vr) // skip, no new commit
    assert(vals(ManifestSink.read(spark, dir)) === Set(1L))
  }

  test("shallow clone reads the source zero-copy and evolves " +
      "independently; clone vacuum never touches borrowed files") {
    val root = Files.createTempDirectory("clone").toString
    val src = root + "/src"
    val dst = root + "/dst"
    ManifestSink.appendWithStats(Seq(1L, 2L).toDF("v"), src, Seq("v"))
    ManifestSink.appendWithStats(Seq(3L).toDF("v"), src, Seq("v"))
    assert(ManifestSink.shallowClone(spark, src, dst) === 0L)
    assert(vals(ManifestSink.read(spark, dst)) === Set(1L, 2L, 3L))
    // borrowed stats survive the clone: range pruning works immediately
    assert(vals(ManifestSink.readWhere(spark, dst, "v",
      Some(3L), None)) === Set(3L))
    // no data was copied: the clone has no data root of its own yet
    assert(!new java.io.File(dst + "/data").exists())
    // divergence: appends land on each side independently
    ManifestSink.append(Seq(4L).toDF("v"), dst)
    ManifestSink.append(Seq(5L).toDF("v"), src)
    assert(vals(ManifestSink.read(spark, dst)) === Set(1L, 2L, 3L, 4L))
    assert(vals(ManifestSink.read(spark, src)) === Set(1L, 2L, 3L, 5L))
    // clone vacuum sweeps only the clone's own root — borrowed source
    // files are not its to delete
    assert(ManifestSink.vacuum(spark, dst).isEmpty)
    assert(vals(ManifestSink.read(spark, src)) === Set(1L, 2L, 3L, 5L))
  }

  test("copy-on-write on the clone rewrites borrowed batches into the " +
      "clone without mutating the source") {
    val root = Files.createTempDirectory("clonecow").toString
    val src = root + "/src"
    val dst = root + "/dst"
    ManifestSink.append(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), src)
    ManifestSink.shallowClone(spark, src, dst)
    // merge on the clone touches a borrowed batch → rewritten under dst
    ManifestSink.merge(Seq((2L, "B")).toDF("k", "s"), dst, Seq("k"))
    val cloneRows = ManifestSink.read(spark, dst)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(cloneRows === Set((1L, "a"), (2L, "B")))
    // source content untouched
    val srcRows = ManifestSink.read(spark, src)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(srcRows === Set((1L, "a"), (2L, "b")))
    // the rewrite landed in the clone's own data root
    assert(new java.io.File(dst + "/data").exists())
  }
}
