package graft.sinks

import java.nio.file.Files

import graft.SparkSpec

class ManifestSinkSpec extends SparkSpec {
  import spark.implicits._

  test("append commits are snapshot-isolated and versioned") {
    val dir = Files.createTempDirectory("msink").toString + "/t"
    assert(ManifestSink.version(spark, dir) === -1L)
    val v0 = ManifestSink.append(Seq(1L, 2L).toDF("v"), dir)
    assert(v0 === 0L)
    // a reader holding the v0 snapshot is unaffected by the next commit
    val snapshotV0 = ManifestSink.read(spark, dir)
    val v1 = ManifestSink.append(Seq(3L).toDF("v"), dir)
    assert(v1 === 1L)
    assert(ManifestSink.read(spark, dir).count() === 3)
    assert(snapshotV0.count() === 2) // file list resolved at read time
  }

  test("replace swaps content atomically; vacuum reclaims orphans") {
    val dir = Files.createTempDirectory("msinkr").toString + "/t"
    ManifestSink.append(spark.range(0, 100).toDF("v"), dir)
    ManifestSink.append(spark.range(100, 120).toDF("v"), dir)
    // compaction: keep only v >= 110 (retention-style rewrite)
    val retained = ManifestSink.read(spark, dir).filter($"v" >= 110)
    ManifestSink.replace(retained, dir)
    assert(ManifestSink.read(spark, dir).count() === 10)
    // two orphaned batch dirs (the replaced appends) + old manifests
    val deleted = ManifestSink.vacuum(spark, dir)
    assert(deleted.size === 2)
    // current snapshot unaffected by vacuum
    assert(ManifestSink.read(spark, dir).count() === 10)
    // idempotent
    assert(ManifestSink.vacuum(spark, dir).isEmpty)
  }

  test("crash between manifest publish and hint write loses nothing") {
    // the manifest rename is the commit point; `_latest` is only a hint.
    // Simulate a crash right after the rename by deleting the hint.
    val dir = Files.createTempDirectory("msinkc").toString + "/t"
    ManifestSink.append(Seq(1L, 2L).toDF("v"), dir)
    ManifestSink.append(Seq(3L).toDF("v"), dir)
    Files.delete(java.nio.file.Paths.get(dir, "_latest"))
    // recovery: version comes from the manifest listing
    assert(ManifestSink.version(spark, dir) === 1L)
    assert(ManifestSink.read(spark, dir).count() === 3)
    // and the NEXT commit chains onto v1 — previously committed batches
    // stay referenced (the pre-fix failure mode orphaned all of them)
    ManifestSink.append(Seq(4L).toDF("v"), dir)
    assert(ManifestSink.version(spark, dir) === 2L)
    assert(ManifestSink.read(spark, dir).count() === 4)
    assert(ManifestSink.vacuum(spark, dir).isEmpty) // nothing orphaned
  }

  test("stale _latest hint is repaired from the listing") {
    val dir = Files.createTempDirectory("msinks").toString + "/t"
    ManifestSink.append(Seq(1L).toDF("v"), dir)
    ManifestSink.append(Seq(2L).toDF("v"), dir)
    // hint rolled back (torn write / crashed overwrite): listing wins
    Files.write(java.nio.file.Paths.get(dir, "_latest"),
      "0".getBytes("UTF-8"))
    assert(ManifestSink.version(spark, dir) === 1L)
    assert(ManifestSink.read(spark, dir).count() === 2)
  }

  test("time travel window: keepVersions retains readable history") {
    val dir = Files.createTempDirectory("msinkt").toString + "/t"
    ManifestSink.append(Seq(1L).toDF("v"), dir)
    ManifestSink.append(Seq(2L).toDF("v"), dir)
    ManifestSink.append(Seq(3L).toDF("v"), dir)
    val deleted = ManifestSink.vacuum(spark, dir, keepVersions = 3)
    assert(deleted.isEmpty) // all three appends still referenced
    assert(ManifestSink.read(spark, dir).count() === 3)
  }
}
