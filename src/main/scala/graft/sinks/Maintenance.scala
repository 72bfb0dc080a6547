package graft.sinks

import org.apache.spark.sql.SparkSession

/** In-loop table maintenance — the policy knob that lets a STREAMING
  * writer schedule its own compaction off [[ManifestSink.maintenancePlan]]
  * verdicts, the lakehouse analog of the reference pipeline running
  * retention inside its own ingest cadence (pipeline.py:43-51) rather
  * than leaving it to an operator.
  *
  * Why in-loop: a 2-second-commit stream mints a sub-threshold manifest
  * entry per trigger — tens of thousands of tiny directories a day —
  * and MoR upserts/deletes mint read-path tombstones. Left alone, both
  * debts grow without bound ("accumulate dribble debt forever", r12
  * verdict); an external nightly job fixes it but couples table health
  * to an operator remembering to run it. With a policy attached, every
  * `everyEpochs`-th epoch pays ONE manifest read (the plan — zero data
  * I/O) and executes only what the plan flags, so a quiet table costs
  * one metadata read per cycle and a dribbling table converges to a
  * bounded entry count while the stream keeps running.
  *
  * Safety under a live writer is exactly the [[ManifestSink.compact]]
  * family's contract: maintenance commits are content-identical
  * rewrites that REBASE over interleaved appends
  * ([[ManifestSink.commitRewriteLines]]), and exactly-once epoch
  * markers ride the manifest HEADER, which every rewrite carries
  * forward — so a replayed epoch stays a no-op even when a maintenance
  * commit landed between the original fold and the replay
  * (MaintenanceLoopSpec pins this). Vacuum — physical reclamation of
  * replaced files and expired manifests — is OPT-IN (r13 verdict #4):
  * `vacuumKeepVersions = 0` (the default) never deletes anything,
  * because retention is a time-travel decision; a caller that opts in
  * states its horizon explicitly and names the catalogs whose published
  * snapshots must survive it (`vacuumProtectCatalogs` — every version
  * pinned by any snapshot there is kept alive with its data,
  * [[Catalog.pinnedVersions]]). A read past the resulting horizon fails
  * loudly with the retention story ([[ManifestSink.readAt]]).
  *
  * At 100 TB: the cycle's decision pass reads one manifest; the
  * compact_small cure reads only the dribble (recorded rows < minRows);
  * only the tombstone purge pays the table — which is why
  * `maxTombstones` is a threshold, not a trigger-per-tombstone.
  */
final case class MaintenancePolicy(
    everyEpochs: Long = 16L,
    minRows: Long = 10000L,
    maxTombstones: Int = 8,
    statsCols: Seq[String] = Nil,
    sortCols: Seq[String] = Nil,
    // 0 = vacuum OFF (default): the cycle rewrites but never reclaims.
    // >= 1 = after the cure, physically delete manifests older than the
    // newest `vacuumKeepVersions` versions and any data they alone
    // referenced — except versions pinned by a snapshot in any of
    // `vacuumProtectCatalogs`, which survive with their data.
    // `vacuumMinAgeMs` guards concurrent appenders (see
    // [[ManifestSink.vacuum]]).
    vacuumKeepVersions: Int = 0,
    vacuumProtectCatalogs: Seq[String] = Nil,
    vacuumMinAgeMs: Long = 0L) {
  require(everyEpochs >= 1, s"everyEpochs must be >= 1, got $everyEpochs")
  require(vacuumKeepVersions >= 0,
    s"vacuumKeepVersions must be >= 0 (0 = off), got $vacuumKeepVersions")
}

object Maintenance {

  /** Epoch hook for `foreachBatch` bodies: run one maintenance cycle
    * when this epoch is due under `policy` (every `everyEpochs`-th,
    * counting epoch `everyEpochs - 1` as the first — a fresh stream
    * does not compact on its very first trigger). `policy` null (the
    * entrypoints' default) or a not-yet-created table = no-op. Returns
    * the executed action names (empty when not due or plan silent).
    *
    * Cadence contract: "due" is `batchId` ARITHMETIC, so the cycle runs
    * approximately every N triggers, not exactly every N committed
    * epochs — a crash-replayed batchId can fire a cycle twice (harmless:
    * the cycle is idempotent and plan-gated, the second run plans
    * silent) and empty triggers still advance the count, so an idle
    * stream drifts the cadence by a few epochs. Exactness is not worth
    * a state store: the plan pass re-checks the table every time. */
  def onEpoch(spark: SparkSession, dir: String, batchId: Long,
      policy: MaintenancePolicy): Seq[String] =
    if (policy == null || (batchId + 1) % policy.everyEpochs != 0) Nil
    else runCycle(spark, dir, policy)

  /** One maintenance cycle: plan (one manifest read, zero data reads),
    * then execute the flagged cure. `purge_debt`'s cure — a full
    * [[ManifestSink.compact]] — subsumes `compact_small`, so at most
    * ONE rewrite runs per cycle; a silent plan runs nothing. */
  def runCycle(spark: SparkSession, dir: String,
      policy: MaintenancePolicy): Seq[String] = {
    if (ManifestSink.version(spark, dir) < 0) return Nil
    val fired = ManifestSink.maintenancePlan(spark, dir, policy.minRows,
      policy.maxTombstones).collect { case (a, true, _, _) => a }
    val cure =
      if (fired.contains("purge_debt")) {
        ManifestSink.compact(spark, dir, policy.statsCols, policy.sortCols)
        Seq("purge_debt")
      } else if (fired.contains("compact_small")) {
        ManifestSink.compactSmall(spark, dir, policy.minRows,
          policy.statsCols, policy.sortCols)
        Seq("compact_small")
      } else Nil
    // opt-in physical reclamation, AFTER the cure (a compaction this
    // cycle just replaced files — they age out of the keep window on the
    // spot instead of waiting a full extra cycle). Catalog-pinned
    // versions survive with their data; vacuum deletes nothing a
    // retained or pinned manifest references.
    val vacuumed =
      if (policy.vacuumKeepVersions >= 1) {
        val protect = policy.vacuumProtectCatalogs.flatMap { cd =>
          if (Catalog.version(spark, cd) < 0) Nil
          else Catalog.pinnedVersions(spark, cd, dir)
        }.distinct
        if (ManifestSink.vacuum(spark, dir, policy.vacuumKeepVersions,
            policy.vacuumMinAgeMs, protect).nonEmpty) Seq("vacuum")
        else Nil
      } else Nil
    cure ++ vacuumed
  }
}
