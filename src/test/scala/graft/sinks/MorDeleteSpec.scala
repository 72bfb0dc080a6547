package graft.sinks

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** Merge-on-read equality-delete tombstones ([[ManifestSink
  * .deleteKeysMergeOnRead]]): a delete commits keys + one manifest line,
  * never rewrites data, and every reader — full, time-travel, pruned,
  * copy-on-write rewrite — agrees with the copy-on-write answer. */
class MorDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String)] =
    df.select("k", "v").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

  // the RESOLVED snapshot (delta manifests resolve through their base
  // chain — byte-identical to the legacy full-snapshot entry list)
  private def manifestLines(dir: String, v: Long): Seq[String] =
    ManifestSink.manifestEntries(spark, dir, v)

  test("a MoR delete rewrites no data, filters reads, stacks, and a " +
      "later re-insert of the deleted key survives") {
    val dir = Files.createTempDirectory("mor").toString + "/t"
    ManifestSink.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val v1 = ManifestSink.append(Seq((3L, "c")).toDF("k", "v"), dir)
    val dataDirs = Files.list(Paths.get(s"$dir/data")).toArray.toSeq
      .map(_.toString)
    val mtimes = dataDirs.map(d =>
      d -> Files.getLastModifiedTime(Paths.get(d))).toMap

    val v2 = ManifestSink.deleteKeysMergeOnRead(
      Seq(2L, 3L).toDF("k"), dir, Seq("k"))
    assert(v2 === v1 + 1)
    // every pre-delete entry line carried VERBATIM (stats included), one
    // tombstone line appended at the end
    val before = manifestLines(dir, v1)
    val after = manifestLines(dir, v2)
    assert(after.take(before.size) === before)
    assert(after.size === before.size + 1)
    // no pre-existing data directory was touched
    dataDirs.foreach { d =>
      assert(Files.getLastModifiedTime(Paths.get(d)) === mtimes(d))
    }
    assert(rows(ManifestSink.read(spark, dir)) === Set((1L, "a")))
    // time travel still sees the pre-delete snapshot
    assert(rows(ManifestSink.readAt(spark, dir, v1)) ===
      Set((1L, "a"), (2L, "b"), (3L, "c")))

    // a re-insert of a deleted key lands AFTER the tombstone: it survives
    ManifestSink.append(Seq((2L, "b2")).toDF("k", "v"), dir)
    assert(rows(ManifestSink.read(spark, dir)) ===
      Set((1L, "a"), (2L, "b2")))
    // a second delete stacks — it kills the re-insert too, and composes
    // with a delete on a DIFFERENT key shape
    ManifestSink.deleteKeysMergeOnRead(Seq(2L).toDF("k"), dir, Seq("k"))
    ManifestSink.deleteKeysMergeOnRead(Seq("a").toDF("v"), dir, Seq("v"))
    assert(rows(ManifestSink.read(spark, dir)) === Set.empty)
    ManifestSink.append(Seq((9L, "z")).toDF("k", "v"), dir)
    assert(rows(ManifestSink.read(spark, dir)) === Set((9L, "z")))
  }

  test("metadata answers degrade while tombstones exist; compact " +
      "materializes them away and restores exact metadata") {
    val dir = Files.createTempDirectory("mormat").toString + "/t"
    ManifestSink.appendWithStats(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir, Seq("k"))
    ManifestSink.appendWithStats(Seq((5L, "e")).toDF("k", "v"), dir, Seq("k"))
    assert(ManifestSink.rowCount(spark, dir) === Some(3L))
    assert(ManifestSink.colBounds(spark, dir, "k").isDefined)
    assert(!ManifestSink.hasTombstones(spark, dir))

    ManifestSink.deleteKeysMergeOnRead(Seq(5L).toDF("k"), dir, Seq("k"))
    assert(ManifestSink.hasTombstones(spark, dir))
    // a tombstone can invalidate any metadata-only answer — both degrade
    // to None rather than risk a wrong exact claim
    assert(ManifestSink.rowCount(spark, dir) === None)
    assert(ManifestSink.colBounds(spark, dir, "k") === None)

    val vc = ManifestSink.compact(spark, dir, statsCols = Seq("k"))
    assert(!ManifestSink.hasTombstones(spark, dir))
    assert(rows(ManifestSink.read(spark, dir)) === Set((1L, "a"), (2L, "b")))
    assert(ManifestSink.rowCount(spark, dir) === Some(2L))
    assert(ManifestSink.colBounds(spark, dir, "k")
      .map { case (_, mn, mx) => (mn, mx) } === Some(("1", "2")))
    // the deleted row is genuinely gone from the materialized files, not
    // just filtered: read the compacted entry's parquet directly
    val entry = manifestLines(dir, vc).head.takeWhile(_ != '\t')
    assert(spark.read.parquet(s"$dir/$entry").select("k")
      .collect().map(_.getLong(0)).toSet === Set(1L, 2L))
  }

  test("pruned reads agree with read().filter on a tombstoned table " +
      "(range, point-lookup, and predicate paths)") {
    val dir = Files.createTempDirectory("morprune").toString + "/t"
    ManifestSink.appendWithStats(
      (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"), dir,
      Seq("k"), bloomCols = Seq("k"))
    ManifestSink.appendWithStats(
      (11L to 20L).map(i => (i, s"v$i")).toDF("k", "v"), dir,
      Seq("k"), bloomCols = Seq("k"))
    ManifestSink.deleteKeysMergeOnRead(
      Seq(5L, 15L).toDF("k"), dir, Seq("k"))

    assert(ManifestSink.readWhere(spark, dir, "k", Some(4L), Some(6L))
      .select("k").collect().map(_.getLong(0)).toSet === Set(4L, 6L))
    assert(ManifestSink.readWhereEq(spark, dir, "k", 15L).isEmpty)
    assert(ManifestSink.readWhereEq(spark, dir, "k", 14L)
      .select("v").head().getString(0) === "v14")
    import org.apache.spark.sql.functions.col
    assert(ManifestSink.readFiltered(spark, dir, col("k") >= 14L)
      .select("k").collect().map(_.getLong(0)).toSet ===
      Set(14L, 16L, 17L, 18L, 19L, 20L))
    // pruning still skips: a range confined to batch 2 never reads batch
    // 1's entry (tombstone entries are not prunable data and never count)
    val (kept, skipped) =
      ManifestSink.prunedEntries(spark, dir, "k", Some(12L), Some(13L))
    assert(kept.size === 1 && skipped.size === 1)
  }

  test("copy-on-write paths on a tombstoned table never resurrect " +
      "deleted rows and carry tombstones forward") {
    val dir = Files.createTempDirectory("morcow").toString + "/t"
    ManifestSink.appendWithStats(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v"), dir, Seq("k"))
    ManifestSink.appendWithStats(
      Seq((4L, "d"), (5L, "e")).toDF("k", "v"), dir, Seq("k"))
    ManifestSink.deleteKeysMergeOnRead(Seq(2L, 4L).toDF("k"), dir, Seq("k"))

    // merge touches batch 1 (key 3): the rewrite must not resurrect the
    // deleted key 2 that shared the batch; the untouched batch 2 still
    // has its tombstoned key 4 filtered by the carried tombstone
    ManifestSink.merge(Seq((3L, "c2")).toDF("k", "v"), dir, Seq("k"))
    assert(rows(ManifestSink.read(spark, dir)) ===
      Set((1L, "a"), (3L, "c2"), (5L, "e")))

    // deleteWhere rewrites the batch holding k=1; deleted rows stay gone
    ManifestSink.deleteWhere(spark, dir,
      Seq(ManifestSink.Range("k", Some(1L), Some(1L))))
    assert(rows(ManifestSink.read(spark, dir)) ===
      Set((3L, "c2"), (5L, "e")))

    // a merge key whose only rows are already tombstone-deleted touches
    // nothing: it inserts fresh (no batch rewrite for a dead key)
    val before = ManifestSink.version(spark, dir)
    ManifestSink.merge(Seq((4L, "d2")).toDF("k", "v"), dir, Seq("k"))
    assert(ManifestSink.version(spark, dir) === before + 1)
    assert(rows(ManifestSink.read(spark, dir)) ===
      Set((3L, "c2"), (4L, "d2"), (5L, "e")))
  }

  test("range tombstones: zero-file retention, position semantics, " +
      "composition with key tombstones, and compaction") {
    val dir = Files.createTempDirectory("morrange").toString + "/t"
    ManifestSink.append(
      (1L to 10L).map(i => (i, s"v$i")).toDF("k", "v"), dir)
    val nData = Files.list(Paths.get(s"$dir/data")).toArray.length
    // retention: expire k <= 4 — one manifest line, NO new file at all
    ManifestSink.deleteRangeMergeOnRead(spark, dir, "k",
      lo = None, hi = Some(4L))
    assert(Files.list(Paths.get(s"$dir/data")).toArray.length === nData)
    assert(ManifestSink.read(spark, dir).select("k")
      .collect().map(_.getLong(0)).toSet === (5L to 10L).toSet)
    // bounded range + a later re-insert inside the range survives
    ManifestSink.deleteRangeMergeOnRead(spark, dir, "k",
      lo = Some(7L), hi = Some(8L))
    ManifestSink.append(Seq((7L, "back")).toDF("k", "v"), dir)
    assert(ManifestSink.read(spark, dir).select("k")
      .collect().map(_.getLong(0)).toSet === Set(5L, 6L, 7L, 9L, 10L))
    // composes with a key tombstone; pruned read agrees
    ManifestSink.deleteKeysMergeOnRead(Seq(9L).toDF("k"), dir, Seq("k"))
    assert(ManifestSink.readWhere(spark, dir, "k", Some(5L), Some(10L))
      .select("k").collect().map(_.getLong(0)).toSet ===
      Set(5L, 6L, 7L, 10L))
    // compaction materializes both kinds away
    ManifestSink.compact(spark, dir)
    assert(!ManifestSink.hasTombstones(spark, dir))
    assert(ManifestSink.read(spark, dir).select("k")
      .collect().map(_.getLong(0)).toSet === Set(5L, 6L, 7L, 10L))
    // bounds must share a type family and carry at least one bound
    intercept[IllegalArgumentException] {
      ManifestSink.deleteRangeMergeOnRead(spark, dir, "k", None, None)
    }
    intercept[IllegalArgumentException] {
      ManifestSink.deleteRangeMergeOnRead(spark, dir, "k",
        Some(1L), Some("x"))
    }
  }

  test("incremental consumers refuse a delete window; restore and " +
      "shallow clone preserve tombstone semantics") {
    val dir = Files.createTempDirectory("morinc").toString + "/t"
    val v0 = ManifestSink.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    val vd = ManifestSink.deleteKeysMergeOnRead(
      Seq(2L).toDF("k"), dir, Seq("k"))
    // changes() over the delete window throws — a retraction cannot ride
    // a file-level incremental read (folds inherit this refusal)
    val e = intercept[IllegalArgumentException] {
      ManifestSink.changes(spark, dir, v0, vd)
    }
    assert(e.getMessage.contains("merge-on-read delete"))
    // ...but key-level CDC expresses it exactly
    val cdc = ManifestSink.changesByKey(spark, dir, v0, vd, Seq("k"))
    assert(cdc.collect().map(r =>
      (r.getAs[Long]("k"), r.getAs[String]("_change_type"))).toSet ===
      Set((2L, "delete")))

    // restore to the pre-delete version un-deletes (position semantics
    // survive the verbatim line copy)
    ManifestSink.restore(spark, dir, v0)
    assert(rows(ManifestSink.read(spark, dir)) === Set((1L, "a"), (2L, "b")))

    // a clone of a tombstoned snapshot borrows the tombstone too
    ManifestSink.restore(spark, dir, vd)
    val dst = Files.createTempDirectory("morclone").toString + "/t"
    ManifestSink.shallowClone(spark, dir, dst)
    assert(rows(ManifestSink.read(spark, dst)) === Set((1L, "a")))
    ManifestSink.append(Seq((2L, "back")).toDF("k", "v"), dst)
    assert(rows(ManifestSink.read(spark, dst)) ===
      Set((1L, "a"), (2L, "back")))
  }
}
