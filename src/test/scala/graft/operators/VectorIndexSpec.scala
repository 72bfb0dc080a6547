package graft.operators

import java.nio.file.{Files, Paths, StandardCopyOption}

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

  test("indexed variants are result-identical to the inline pipelines") {
    for ((a, b) <- Seq(
        "q117_ann_ivf_indexed" -> "q58_ann_ivf_cells",
        "q118_ann_ivf_lloyd_indexed" -> "q58b_ann_ivf_lloyd",
        "q119_ann_pq_indexed" -> "q94_ann_pq")) {
      val ia = graft.SparkEntry.queries(a)(spark, sf)
        .collect().map(_.toString).toSeq
      val ib = graft.SparkEntry.queries(b)(spark, sf)
        .collect().map(_.toString).toSeq
      assert(ia === ib, s"$a must match $b bit-for-bit")
      assert(ia.nonEmpty)
    }
  }
}
