package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

import scala.collection.mutable

import graft.SparkSpec
import graft.sinks.ManifestSink

/** The ANN index amortization contract: an artifact is built ONCE per
  * corpus version, every later invocation READS the stored commit, and
  * any corpus change (append, rewrite, regeneration) invalidates it. */
class VectorIndexSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir(tag: String): String =
    Files.createTempDirectory(s"graft-vidx-$tag").toString

  test("loadOrBuild builds once, then reads the stored artifact") {
    val idx = freshDir("reuse") + "/art"
    var builds = 0
    def build = { builds += 1; Seq((1L, "a"), (2L, "b")).toDF("id", "v") }
    val first = VectorIndex.loadOrBuild(spark, idx, "sha:f1")(build)
      .collect().map(_.toString).sorted
    val second = VectorIndex.loadOrBuild(spark, idx, "sha:f1")(build)
      .collect().map(_.toString).sorted
    assert(builds === 1, "second invocation must read, not rebuild")
    assert(first === second)
    // the provenance marker rides in the SAME commit as the artifact
    val v = ManifestSink.version(spark, idx)
    assert(ManifestSink.manifestHeader(spark, idx, v)
      .get(VectorIndex.FingerprintKey) === Some("sha:f1"))
  }

  test("a changed corpus fingerprint invalidates and rebuilds") {
    val idx = freshDir("inval") + "/art"
    var builds = 0
    def build = { builds += 1; Seq((builds.toLong, "x")).toDF("id", "v") }
    VectorIndex.loadOrBuild(spark, idx, "sha:a")(build)
    val after = VectorIndex.loadOrBuild(spark, idx, "sha:b")(build)
      .collect()
    assert(builds === 2)
    assert(after.map(_.getLong(0)).toSeq === Seq(2L),
      "rebuild must REPLACE the stale artifact, not append beside it")
    val v = ManifestSink.version(spark, idx)
    assert(ManifestSink.manifestHeader(spark, idx, v)
      .get(VectorIndex.FingerprintKey) === Some("sha:b"))
  }

  test("corpus fingerprint tracks file-level change (append/rewrite)") {
    val corpus = freshDir("fp")
    Files.writeString(Paths.get(corpus, "part-0.parquet"), "AAAA")
    val fp1 = VectorIndex.corpusFingerprint(spark, corpus)
    val fp1Again = VectorIndex.corpusFingerprint(spark, corpus)
    assert(fp1 === fp1Again, "fingerprint must be stable on an unchanged corpus")
    assert(fp1.startsWith("sha:"), "non-numeric marker (header merge rule)")
    // append: a new file changes the listing
    Files.writeString(Paths.get(corpus, "part-1.parquet"), "BBBB")
    val fp2 = VectorIndex.corpusFingerprint(spark, corpus)
    assert(fp2 !== fp1)
    // rewrite: same names, different length
    Files.writeString(Paths.get(corpus, "part-1.parquet"), "BBBBBB")
    assert(VectorIndex.corpusFingerprint(spark, corpus) !== fp2)
  }

  test("corpus append end-to-end: the indexed query rebuilds against the new corpus") {
    // a private corpus copy this test can mutate
    val corpus = freshDir("e2e")
    Files.copy(Paths.get(s"$sf/embeddings.parquet"),
      Paths.get(corpus, "embeddings.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val idx = s"${VectorIndex.indexRoot(corpus)}/ivf_sample"
    def run() = graft.SparkEntry.queries("q117_ann_ivf_indexed")(spark, corpus)
    val r1 = run().collect().map(_.toString).toSeq
    val vAfterFirst = ManifestSink.version(spark, idx)
    val r2 = run().collect().map(_.toString).toSeq
    assert(r1 === r2)
    assert(ManifestSink.version(spark, idx) === vAfterFirst,
      "unchanged corpus: the second run must not commit a new index version")
    // genuinely change the corpus: rewrite it without the even vec_ids
    // (the listing's files/lengths/mtimes all change)
    val shrunk = spark.read.parquet(s"$corpus/embeddings.parquet")
      .filter("vec_id % 2 = 1")
    val tmp = freshDir("shrunk")
    shrunk.write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    Files.delete(Paths.get(s"$corpus/embeddings.parquet"))
    Files.move(Paths.get(s"$tmp/embeddings.parquet"),
      Paths.get(s"$corpus/embeddings.parquet"))
    val r3 = run().collect().map(_.toString).toSeq
    assert(ManifestSink.version(spark, idx) > vAfterFirst,
      "corpus change must invalidate the stored index")
    assert(r3 !== r1,
      "the rebuilt index must reflect the changed corpus, not the stale one")
  }

  /** Write `df` as ONE flat parquet file at `target` (Spark writes a
    * directory; corpora here are directories of plain files). */
  private def writeFlat(df: org.apache.spark.sql.DataFrame,
      target: String): Unit = {
    val tmp = Files.createTempDirectory("graft-flat").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$tmp/out")
    val part = new java.io.File(s"$tmp/out").listFiles()
      .find(f => f.getName.startsWith("part-") &&
        f.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(target).getParent)
    Files.move(part.toPath, Paths.get(target),
      StandardCopyOption.REPLACE_EXISTING)
  }

  test("incremental maintenance: pure append encodes ONLY the delta files") {
    val corpus = freshDir("incr")
    // corpus v1: one file of ids 0-9; v2 appends a file of ids 100-104
    writeFlat(Seq.range(0L, 10L).map(i => (i, s"v$i"))
      .toDF("vec_id", "payload"), s"$corpus/t.parquet/a.parquet")
    val idx = freshDir("incr-idx") + "/art"
    val builtFrom = mutable.ArrayBuffer.empty[Seq[String]]
    def run() = VectorIndex.loadOrBuildIncremental(spark, idx,
      s"$corpus/t.parquet") { files =>
      builtFrom += files
      spark.read.parquet(files: _*).select($"vec_id", $"payload")
    }
    val r1 = run().collect()
    assert(r1.length === 10)
    run() // unchanged corpus: read only
    assert(builtFrom.size === 1)
    writeFlat(Seq.range(100L, 105L).map(i => (i, s"v$i"))
      .toDF("vec_id", "payload"), s"$corpus/t.parquet/b.parquet")
    val r2 = run().collect()
    assert(builtFrom.size === 2, "append must trigger exactly one delta build")
    assert(builtFrom(1).nonEmpty &&
      builtFrom(1).forall(_.endsWith("b.parquet")),
      s"delta build must see ONLY the new files, got ${builtFrom(1)}")
    assert(r2.map(_.getLong(0)).sorted ===
      (Seq.range(0L, 10L) ++ Seq.range(100L, 105L)),
      "artifact after append = old rows + delta rows")
    // a REWRITE of an old file must fall back to a full rebuild
    writeFlat(Seq.range(0L, 8L).map(i => (i, s"w$i"))
      .toDF("vec_id", "payload"), s"$corpus/t.parquet/a.parquet")
    val r3 = run().collect()
    assert(builtFrom.size === 3)
    assert(builtFrom(2).size === 2,
      "rewrite must rebuild from the FULL file list")
    assert(r3.map(_.getLong(0)).sorted ===
      (Seq.range(0L, 8L) ++ Seq.range(100L, 105L)))
  }

  test("incremental q119 after a corpus append equals a from-scratch rebuild") {
    // corpus copy with room to grow
    val corpus = freshDir("pq-incr")
    val e = spark.read.parquet(s"$sf/embeddings.parquet")
    writeFlat(e.filter($"vec_id" < 150),
      s"$corpus/embeddings.parquet/base.parquet")
    val q119 = graft.SparkEntry.queries("q119_ann_pq_indexed")
    val idx = s"${graft.operators.VectorIndex.indexRoot(corpus)}/pq_recon"
    q119(spark, corpus).count() // build v1 index
    val v1 = graft.sinks.ManifestSink.version(spark, idx)
    // append the rest of the corpus as a second file
    writeFlat(e.filter($"vec_id" >= 150),
      s"$corpus/embeddings.parquet/delta.parquet")
    val incr = q119(spark, corpus).collect().map(_.toString).toSeq
    assert(graft.sinks.ManifestSink.version(spark, idx) === v1 + 1,
      "pure append must extend the index with ONE append commit")
    // ground truth: the inline (always-from-scratch) pipeline on the
    // same grown corpus
    val scratch = graft.SparkEntry.queries("q94_ann_pq")(spark, corpus)
      .collect().map(_.toString).toSeq
    assert(incr === scratch,
      "delta-maintained index must answer identically to a full re-encode")
  }

  test("posting-list index prunes an equality probe to the probed cell's entries") {
    // build (or reuse) the cell-partitioned index, then verify the
    // manifest plans a single-cell probe WITHOUT the other cells' entries
    graft.SparkEntry.queries("q120_ann_ivf_pruned")(spark, sf).count()
    val idx = s"${VectorIndex.indexRoot(sf)}/ivf_cells"
    val v = ManifestSink.version(spark, idx)
    val all = ManifestSink.entries(spark, idx, v)
    assert(all.size > 1, "per-cell layout must yield one entry per cell")
    val (kept, dropped) = ManifestSink.prunedEntriesEq(spark, idx, "cell", 0L)
    assert(kept.size + dropped.size === all.size)
    assert(kept.nonEmpty, "cell 0 is populated at this SF")
    assert(kept.size < all.size,
      "an equality probe must NOT plan every cell's entries")
    // and the pruned read returns exactly that cell's rows
    val rows = ManifestSink.readWhereEq(spark, idx, "cell", 0L)
      .select($"cell").distinct().collect().map(_.getLong(0)).toSeq
    assert(rows === Seq(0L))
  }

  test("listing/artifact skew (crash corner) degrades to full rebuild, never doubles") {
    // simulate a crash BETWEEN the artifact commit and the listing
    // refresh: artifact holds {a,b}@fp2, listing still describes {a} —
    // without the fingerprint-of-listing check, the next append would
    // re-encode b (doubled rows)
    val corpus = freshDir("skew")
    writeFlat(Seq.range(0L, 10L).map(i => (i, s"v$i"))
      .toDF("vec_id", "payload"), s"$corpus/t.parquet/a.parquet")
    val idx = freshDir("skew-idx") + "/art"
    val builtFrom = mutable.ArrayBuffer.empty[Seq[String]]
    def run() = VectorIndex.loadOrBuildIncremental(spark, idx,
      s"$corpus/t.parquet") { files =>
      builtFrom += files
      spark.read.parquet(files: _*).select($"vec_id", $"payload")
    }
    run()
    val staleListing = graft.sinks.ManifestSink
      .read(spark, idx + "_listing").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    writeFlat(Seq.range(100L, 105L).map(i => (i, s"v$i"))
      .toDF("vec_id", "payload"), s"$corpus/t.parquet/b.parquet")
    run() // artifact now {a,b}; listing refreshed
    // crash simulation: roll the listing back to the {a} state
    ManifestSink.replace(staleListing.toDF("path", "meta"), idx + "_listing")
    writeFlat(Seq.range(200L, 203L).map(i => (i, s"v$i"))
      .toDF("vec_id", "payload"), s"$corpus/t.parquet/c.parquet")
    val r = run().collect().map(_.getLong(0)).sorted
    assert(builtFrom.last.size === 3,
      "skewed listing must force a FULL rebuild (all 3 files), " +
        s"got ${builtFrom.last}")
    assert(r === (Seq.range(0L, 10L) ++ Seq.range(100L, 105L) ++
      Seq.range(200L, 203L)), "no doubled rows after the skew recovery")
  }

  test("compacting a delta-grown index preserves the fingerprint: no spurious rebuild") {
    // the maintenance lifecycle end-to-end: build → delta-append →
    // OPTIMIZE → the next loadOrBuildIncremental must READ, not rebuild
    // (headers carry through compaction), and content is unchanged
    val corpus = freshDir("compact")
    writeFlat(Seq.range(0L, 10L).map(i => (i, s"v$i"))
      .toDF("vec_id", "payload"), s"$corpus/t.parquet/a.parquet")
    val idx = freshDir("compact-idx") + "/art"
    var builds = 0
    def run() = VectorIndex.loadOrBuildIncremental(spark, idx,
      s"$corpus/t.parquet") { files =>
      builds += 1
      spark.read.parquet(files: _*).select($"vec_id", $"payload")
    }
    run()
    writeFlat(Seq.range(100L, 105L).map(i => (i, s"v$i"))
      .toDF("vec_id", "payload"), s"$corpus/t.parquet/b.parquet")
    val before = run().collect().map(_.toString).sorted
    assert(builds === 2)
    val vGrown = ManifestSink.version(spark, idx)
    assert(ManifestSink.entries(spark, idx, vGrown).size === 2,
      "delta append leaves two entries — the pile OPTIMIZE folds")
    ManifestSink.compact(spark, idx)
    val after = run().collect().map(_.toString).sorted
    assert(builds === 2, "compaction must NOT invalidate the fingerprint")
    assert(after === before)
    val vNow = ManifestSink.version(spark, idx)
    assert(ManifestSink.entries(spark, idx, vNow).size === 1)
  }

  test("indexed variants are result-identical to the inline pipelines") {
    for ((a, b) <- Seq(
        "q117_ann_ivf_indexed" -> "q58_ann_ivf_cells",
        "q118_ann_ivf_lloyd_indexed" -> "q58b_ann_ivf_lloyd",
        "q119_ann_pq_indexed" -> "q94_ann_pq",
        "q120_ann_ivf_pruned" -> "q58_ann_ivf_cells")) {
      val ia = graft.SparkEntry.queries(a)(spark, sf)
        .collect().map(_.toString).toSeq
      val ib = graft.SparkEntry.queries(b)(spark, sf)
        .collect().map(_.toString).toSeq
      assert(ia === ib, s"$a must match $b bit-for-bit")
      assert(ia.nonEmpty)
    }
  }
}
