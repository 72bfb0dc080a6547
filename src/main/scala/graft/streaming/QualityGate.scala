package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.NbQuality
import graft.sinks.ManifestSink

/** Model-scored streaming admission — the SIXTH admission modality
  * beside the five fingerprint-dedup gates ([[StreamingDedup]],
  * [[StreamingSemanticDedup]]): each micro-batch of documents scores
  * against the CURRENT naive-Bayes model state (the
  * [[graft.sinks.AggMatView]] table q214 maintains incrementally) and
  * splits — keeps append to the main table, rejects to a quarantine
  * table with their scores attached for triage. This closes the online
  * curation loop: the model FOLDS forward O(delta) as labeled corpus
  * arrives (q214), and ingestion applies the freshest committed model
  * per epoch with no restart, because the state is re-read each trigger
  * (one manifest read + a vocabulary-sized load — the same cost class
  * as the gate's own scoring join).
  *
  * Exactly-once under foreachBatch's at-least-once delivery: both
  * tables fold via batchId-marked appends ([[ManifestSink.appendOnce]]),
  * each guarded by its own marker — a replayed epoch, including one
  * that crashed BETWEEN the two commits, re-lands only the side that
  * never committed ([[LateDataChannel]]'s two-table argument; reject
  * side first, so a crash after the reject commit replays into a
  * reject-side skip + main commit, never a double).
  *
  * Determinism caveat, stated rather than hidden: admission depends on
  * WHICH model version a batch scored against, so two runs that
  * interleave model refreshes differently can route borderline docs
  * differently — the audit trail is the quarantine table's attached
  * scores plus the model view's absorbed-version headers. The scoring
  * itself is [[NbQuality]]'s engine-exact kernel, identical to the
  * batch gates.
  *
  * At 100 TB: per trigger = one batch-sized scoring join against the
  * broadcast vocabulary frame + two manifest commits; no stream state.
  */
object QualityGate {

  /** Fold one micro-batch through the gate. `docs` must carry
    * (`idCol`, `textCol`); keeps land in `mainDir` with original
    * columns, rejects in `rejectDir` with (avg_llr, n_tokens) attached.
    * Docs whose tokens all miss the model vocabulary score no rows and
    * are REJECTED (null score) — unknown-vocabulary input is quarantine
    * territory, not silent admission. Returns the two tables' versions
    * after the folds (unchanged on a replayed no-op epoch). */
  def admitEpoch(spark: SparkSession, docs: DataFrame, batchId: Long,
      modelViewDir: String, mainDir: String, rejectDir: String,
      idCol: String = "doc_id", textCol: String = "text"): (Long, Long) = {
    val model = NbQuality.modelFromState(
      ManifestSink.read(spark, modelViewDir))
    val scored = NbQuality.score(docs, model, idCol, textCol)
      .select(col(idCol), col("n_tokens"), col("avg_llr"), col("keep"))
    val routed = docs.join(scored, Seq(idCol), "left")
      .withColumn("__admit", coalesce(col("keep"), lit(false)))
      .persist() // both sides read it once; unpersisted below
    try {
      val rejected = routed.filter(!col("__admit"))
        .drop("keep", "__admit")
      val admitted = routed.filter(col("__admit"))
        .drop("n_tokens", "avg_llr", "keep", "__admit")
      // reject side first: a crash between the commits replays into a
      // reject-side no-op + main commit (LateDataChannel's argument)
      val vR = ManifestSink.appendOnce(rejected, rejectDir, batchId)
      val vA = ManifestSink.appendOnce(admitted, mainDir, batchId)
      (vA, vR)
    } finally routed.unpersist()
  }
}
