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
  * reject-side skip + main commit, never a double). That two-table
  * argument only holds if the replay ROUTES identically — so the model
  * version the first attempt scored against is stamped into the
  * reject-side commit header ([[ModelVKey]], same atomic commit as the
  * batch marker), and a replay whose reject side already covers this
  * batch re-scores against [[ManifestSink.readAt]] of that PINNED
  * version, not the freshest. Without the pin, a model refresh landing
  * between the crash and the replay could flip a borderline doc's
  * verdict: keep→reject would land it in NEITHER table (reject marker
  * skips, main never receives), reject→keep in BOTH.
  *
  * Determinism caveat, stated rather than hidden: admission depends on
  * WHICH model version a batch scored against, so two runs that
  * interleave model refreshes differently can route borderline docs
  * differently — the audit trail is the quarantine table's attached
  * scores plus the pinned model version in its commit headers. The
  * scoring itself is [[NbQuality]]'s engine-exact kernel, identical to
  * the batch gates.
  *
  * At 100 TB: per trigger = one batch-sized scoring join against the
  * broadcast vocabulary frame + two manifest commits; no stream state.
  */
object QualityGate {

  /** Reject-side header key pinning the model-view version this epoch
    * scored against. Model versions only grow, so the monotonic (max)
    * header merge preserves the latest pin; replays are sequential
    * (Structured Streaming re-runs a failed epoch before advancing), so
    * the latest pin IS the crashed epoch's pin. */
  val ModelVKey = "qualitygate.model.version"

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
    // Replay of an epoch whose reject side committed: score against the
    // model version the FIRST attempt used (pinned in its header), so
    // the admitted set exactly complements the already-committed rejects
    // even if the model view was refreshed in between. Retention
    // dependency: the pin is only as durable as the model view's
    // manifest history — a vacuum/retention pass on `modelViewDir` that
    // drops version `modelV` breaks replay of any epoch pinned to it,
    // so the model view must retain at least the versions pinned by
    // not-yet-finalized epochs (ManifestSink.vacuum refuses pinned
    // versions for exactly this class of reader).
    val replayed = ManifestSink.version(spark, rejectDir) >= 0 &&
      ManifestSink.lastBatchId(spark, rejectDir) >= batchId
    val pinned: Option[Long] =
      if (replayed) {
        val p = ManifestSink.manifestHeader(spark, rejectDir,
            ManifestSink.version(spark, rejectDir))
          .get(ModelVKey).flatMap(_.toLongOption)
        // A detected replay with NO pin means the reject table predates
        // the pinning gate (or its header was rewritten). Silently
        // scoring against the FRESHEST model would reintroduce the
        // exact neither/both-table routing hazard the pin closes — fail
        // loudly instead; the operator backfills the header or accepts
        // the hazard explicitly by clearing the reject-side marker.
        if (p.isEmpty) throw new IllegalStateException(
          s"replay of epoch $batchId detected on '$rejectDir' but its " +
            s"manifest header carries no $ModelVKey pin: the reject " +
            "side was written by a pre-pinning gate. Refusing to score " +
            "against the freshest model (verdict-flip hazard).")
        p
      } else None
    val modelV = pinned.getOrElse(ManifestSink.version(spark, modelViewDir))
    val model = NbQuality.modelFromState(
      ManifestSink.readAt(spark, modelViewDir, modelV))
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
      // reject-side no-op + main commit (LateDataChannel's argument);
      // the model pin rides the same atomic commit as the batch marker
      val vR = ManifestSink.appendOnceWithHeader(rejected, rejectDir,
        batchId, Map(ModelVKey -> modelV.toString))
      val vA = ManifestSink.appendOnce(admitted, mainDir, batchId)
      (vA, vR)
    } finally routed.unpersist()
  }
}
