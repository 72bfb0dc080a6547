package graft.operators

import java.nio.file.Files

import graft.SparkSpec

/** Contract of the [[Lineage]] seam: the iterative operators' lineage
  * cuts follow `graft.iterative.checkpoint`, results are mode-invariant,
  * and the reliable mode refuses to run without a fault-tolerant
  * checkpoint location instead of silently degrading to local. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def withMode[A](mode: String)(body: => A): A = {
    spark.conf.set(Lineage.ModeKey, mode)
    try body finally spark.conf.unset(Lineage.ModeKey)
  }

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),
    (3L, "an entirely different document about spark lineage"),
    (4L, "the quick brown fox jumps over the lazy dog")
  ).toDF("doc_id", "text")

  test("reliable mode without a checkpoint dir refuses loudly; unknown " +
      "modes refuse loudly") {
    // a fresh session view shares the context; simulate the unset state
    // by checking the guard directly on a session without a dir
    val bare = spark.newSession()
    bare.conf.set(Lineage.ModeKey, "reliable")
    if (bare.sparkContext.getCheckpointDir.isEmpty) {
      val e = intercept[IllegalStateException] {
        Lineage.cut(bare.range(3).toDF())
      }
      assert(e.getMessage.contains("setCheckpointDir"))
    } // (if an earlier test set the context dir, the guard is moot here)
    val e2 = intercept[IllegalArgumentException] {
      withMode("turbo")(Lineage.cut(docs))
    }
    assert(e2.getMessage.contains(Lineage.ModeKey))
  }
  test("reliable mode checkpoints through the checkpoint dir and " +
      "returns the same rows as local mode") {
    val local = DedupOps.minhashNearDup(docs, "doc_id", "text")
      .collect().toSet
    val dir = Files.createTempDirectory("lineage_ckpt").toString
    spark.sparkContext.setCheckpointDir(dir)
    val reliable = withMode("reliable") {
      DedupOps.minhashNearDup(docs, "doc_id", "text").collect().toSet
    }
    assert(reliable === local)
    assert(local.nonEmpty) // the fixture really exercises the cut path
    // the cuts actually went through the reliable path: checkpoint
    // RDD directories exist under the configured location
    val wrote = Files.walk(java.nio.file.Paths.get(dir))
    try assert(wrote.filter(p => p.getFileName.toString.startsWith("rdd-"))
      .findFirst().isPresent, "no reliable checkpoint was written")
    finally wrote.close()
  }

}
