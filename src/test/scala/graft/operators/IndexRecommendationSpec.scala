package graft.operators

import graft.SparkSpec

/** The recommendation must TRACK the measured panel (r9 verdict #5): the
  * returned method's panel recall meets the target, no cheaper qualifying
  * method exists, and impossible targets fall back to brute force. */
class IndexRecommendationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val panel =
    graft.SparkEntry.queries("q77_ann_recall")(spark, sf)

  private def meanRecall: Map[String, Double] = panel
    .groupBy($"method")
    .agg(org.apache.spark.sql.functions.avg($"recall_at_5").as("r"))
    .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("recommendation tracks the measured panel at several targets") {
    val recalls = meanRecall
    for (target <- Seq(0.2, 0.5, 0.8, 0.9)) {
      val pick = VectorOps.recommendIndex(panel, target)
      val qualifying = recalls.filter(_._2 >= target)
      if (qualifying.isEmpty)
        assert(pick === "brute_force",
          s"target $target: nothing qualifies, must fall back")
      else {
        assert(recalls(pick) >= target,
          s"target $target: picked $pick below target")
        val cheaper = qualifying.filter { case (m, _) =>
          VectorOps.annCandidateCost(m) < VectorOps.annCandidateCost(pick)
        }
        assert(cheaper.isEmpty,
          s"target $target: $cheaper qualify and are cheaper than $pick")
      }
    }
  }

  test("impossible recall target falls back to brute force") {
    assert(VectorOps.recommendIndex(panel, 1.01) === "brute_force")
  }

  test("candidate budget constrains the choice (synthetic panel)") {
    // a panel where everything measures recall 0.9: the pick is purely
    // cost-driven — pq (1/64) unconstrained; ivf once the budget
    // excludes pq... (budget below pq's cost is impossible here, so
    // instead exclude the cheap methods by recall)
    val synth = Seq(
      ("ivf", 0L, 5L, 1.0), ("ivf_lloyd", 0L, 5L, 1.0),
      ("lsh", 0L, 5L, 1.0), ("lsh_multi", 0L, 5L, 1.0),
      ("pq", 0L, 5L, 1.0))
      .toDF("method", "query_id", "hits", "recall_at_5")
    assert(VectorOps.recommendIndex(synth, 0.9) === "pq")
    // budget below pq's 1/64 excludes every approximate method
    assert(VectorOps.recommendIndex(synth, 0.9,
      maxCandidateFraction = 0.01) === "brute_force")
    // ties on cost (ivf vs ivf_lloyd) break by higher recall, then name
    val tied = Seq(
      ("ivf", 0L, 4L, 0.8), ("ivf_lloyd", 0L, 5L, 1.0))
      .toDF("method", "query_id", "hits", "recall_at_5")
    assert(VectorOps.recommendIndex(tied, 0.5,
      maxCandidateFraction = 0.2) === "ivf_lloyd")
  }

  test("q121 reads a STORED recall panel: built once, fingerprint-" +
      "stamped, row-identical to the live q77 measurement") {
    import graft.sinks.ManifestSink
    val panelDir = s"${VectorIndex.indexRoot(sf)}/recall_panel_m6"
    // the artifact survives across sessions on this host — start clean
    // so this test observes the BUILD, not a previous run's artifact
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(panelDir))
    val q121 = graft.SparkEntry.queries("q121_index_recommendation")
    q121(spark, sf).collect()
    val v1 = ManifestSink.version(spark, panelDir)
    assert(v1 >= 0, "first q121 invocation must commit the panel artifact")
    // provenance: stamped with the embeddings corpus fingerprint, so a
    // corpus change (generic loadOrBuild contract, VectorIndexSpec)
    // invalidates exactly when the measured recalls could change
    val fp = VectorIndex.corpusFingerprint(spark, s"$sf/embeddings.parquet")
    assert(ManifestSink.manifestHeader(spark, panelDir, v1)
      .get(VectorIndex.FingerprintKey) === Some(fp))
    // build-once: a second invocation reads the commit, never re-runs
    // the five ANN pipelines (no new manifest version)
    q121(spark, sf).collect()
    assert(ManifestSink.version(spark, panelDir) === v1)
    // the stored panel is row-identical to the live measurement
    val stored = ManifestSink.read(spark, panelDir)
      .collect().map(_.toString).sorted
    val live = panel.collect().map(_.toString).sorted
    assert(stored === live)
  }
}
