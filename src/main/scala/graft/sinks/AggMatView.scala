package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** MANAGED aggregate materialized view — the single-table analog of
  * [[IncrementalJoinView]], closing the loop between [[IncrementalAgg]]
  * (the fold math) and [[graft.plans.ViewRewrite]] (the transparent
  * serve): the state lives in its own [[ManifestSink]] table whose
  * manifest HEADER records the base version it has absorbed, so fold
  * position and state rows are one atomic commit — no crash window
  * between "new state" and "remember where I am".
  *
  *   - [[create]] aggregates the base snapshot once and commits state +
  *     position together.
  *   - [[refresh]] folds an append-only window O(delta + state):
  *     aggregate ONLY the new batches ([[ManifestSink.changes]], located
  *     by manifest diff) and merge into the aggregate-sized state; a
  *     window containing a rewrite or merge-on-read delete RECOMPUTES
  *     from the snapshot instead (`folded = false`) — the view keeps
  *     serving through table maintenance. State commits REPLACE the
  *     table (states supersede, they don't accumulate), so concurrent
  *     refreshes race on the manifest name and the loser fails loudly.
  *   - [[serve]] registers the state with [[graft.plans.ViewRewrite]]
  *     against the base's entry dirs AT THE ABSORBED VERSION — always
  *     safe (it matches exactly reads of that snapshot; a base commit
  *     structurally ends the match), one call after each refresh.
  *
  * The maintenance loop a 100 TB deployment runs per table is therefore
  * three lines: append batches → `refresh` → `serve`. */
object AggMatView {

  private val BaseVKey = "amv_base_v"

  private def absorbed(spark: SparkSession, viewDir: String): Long = {
    val v = ManifestSink.version(spark, viewDir)
    require(v >= 0, s"$viewDir has no committed version — use create")
    ManifestSink.manifestHeader(spark, viewDir, v).getOrElse(BaseVKey,
      sys.error(s"$viewDir has no $BaseVKey header — not an AggMatView"))
      .toLong
  }

  /** Materialize the grouped state of `baseDir`'s current snapshot as a
    * new view table at `viewDir`. Returns the view's version (0). */
  def create(spark: SparkSession, viewDir: String, baseDir: String,
      keys: Seq[String], value: String): Long = {
    require(ManifestSink.version(spark, viewDir) < 0,
      s"AggMatView $viewDir already exists — use refresh")
    val vB = ManifestSink.version(spark, baseDir)
    require(vB >= 0, s"base $baseDir must be a committed table")
    ManifestSink.appendWithHeader(
      IncrementalAgg.aggregate(
        ManifestSink.readAt(spark, baseDir, vB), keys, value),
      viewDir, Map(BaseVKey -> vB.toString))
  }

  /** Advance the view to the base's current version. Append-only windows
    * fold (aggregate the delta batches, merge into the state); windows
    * with removed entries or new tombstones recompute from the snapshot.
    * Returns (view version, folded). */
  def refresh(spark: SparkSession, viewDir: String, baseDir: String,
      keys: Seq[String], value: String): (Long, Boolean) = {
    val pos = absorbed(spark, viewDir)
    val vB = ManifestSink.version(spark, baseDir)
    if (vB == pos) return (ManifestSink.version(spark, viewDir), true)
    val state = ManifestSink.read(spark, viewDir)
    val (next, folded) = IncrementalAgg.refreshOrRecompute(spark, state,
      baseDir, pos, vB, keys, value)
    (ManifestSink.replaceWithHeader(next, viewDir,
      Map(BaseVKey -> vB.toString)), folded)
  }

  /** [[create]] over the SUBTRACTABLE (count, exact-decimal-sum) state
    * ([[IncrementalAgg.aggregateSums]]) — pair with [[refreshSums]] when
    * the view serves counts/sums: merge-on-read DELETE and UPSERT
    * windows then fold as retractions instead of forcing the snapshot
    * recompute the bounded state demands. */
  def createSums(spark: SparkSession, viewDir: String, baseDir: String,
      keys: Seq[String], value: String): Long = {
    require(ManifestSink.version(spark, viewDir) < 0,
      s"AggMatView $viewDir already exists — use refreshSums")
    val vB = ManifestSink.version(spark, baseDir)
    require(vB >= 0, s"base $baseDir must be a committed table")
    ManifestSink.appendWithHeader(
      IncrementalAgg.aggregateSums(
        ManifestSink.readAt(spark, baseDir, vB), keys, value),
      viewDir, Map(BaseVKey -> vB.toString))
  }

  /** Advance a [[createSums]] view to the base's current version with
    * the three-mode fold ([[IncrementalAgg.refreshSums]]): appends fold,
    * merge-on-read deletes/upserts fold as retractions, only rewrites
    * recompute. Returns (view version, mode ∈ fresh | fold |
    * retract_fold | recompute); the header-carried fold position keeps
    * state rows and absorbed version one atomic commit, exactly as
    * [[refresh]]. */
  def refreshSums(spark: SparkSession, viewDir: String, baseDir: String,
      keys: Seq[String], value: String): (Long, String) = {
    val pos = absorbed(spark, viewDir)
    val vB = ManifestSink.version(spark, baseDir)
    if (vB == pos) return (ManifestSink.version(spark, viewDir), "fresh")
    val state = ManifestSink.read(spark, viewDir)
    val (next, mode) = IncrementalAgg.refreshSums(spark, state,
      baseDir, pos, vB, keys, value)
    (ManifestSink.replaceWithHeader(next, viewDir,
      Map(BaseVKey -> vB.toString)), mode)
  }

  /** Register the current state with the transparent rewrite, keyed to
    * the base snapshot the view has absorbed. Call after each refresh. */
  def serve(spark: SparkSession, viewDir: String, baseDir: String,
      keys: Seq[String], value: String): Unit =
    graft.plans.ViewRewrite.registerState(spark,
      ManifestSink.dataPathsAt(spark, baseDir,
        absorbed(spark, viewDir)),
      keys, value,
      ManifestSink.currentDataPaths(spark, viewDir))

  /** Per-epoch STREAMING maintenance — the `foreachBatch` body that
    * keeps base AND view current in one call: append the epoch
    * exactly-once ([[ManifestSink.appendOnce]], idempotent under Spark
    * epoch replay), then fold the view (created on the first epoch).
    * Replay safety COMPOSES for free: a replayed epoch's appendOnce is
    * a no-op, so the base version does not advance and the refresh sees
    * equal positions — the fold cannot double-absorb, whatever commit
    * point a crash landed on. Returns (view version, folded). */
  def absorbEpoch(spark: SparkSession, batch: DataFrame, batchId: Long,
      baseDir: String, viewDir: String, keys: Seq[String],
      value: String): (Long, Boolean) = {
    ManifestSink.appendOnce(batch, baseDir, batchId)
    if (ManifestSink.version(spark, viewDir) < 0)
      (create(spark, viewDir, baseDir, keys, value), true)
    else refresh(spark, viewDir, baseDir, keys, value)
  }

  /** [[absorbEpoch]] with in-loop BASE maintenance ([[Maintenance
    * .onEpoch]]): an epoch-per-trigger stream mints one sub-threshold
    * base entry per epoch, and nothing else ever compacts a view's base
    * table. The cycle runs AFTER the view has absorbed the epoch, so
    * the window a due-epoch compaction disturbs is already folded; the
    * NEXT refresh sees the rewrite (entries removed) and recomputes
    * once from the compacted snapshot — the documented cost of
    * rewriting a view's base, paid once per maintenance cycle instead
    * of never compacting at all. Epoch markers survive the rewrite
    * (headers carry forward), so replays stay no-ops across it. */
  def absorbEpoch(spark: SparkSession, batch: DataFrame, batchId: Long,
      baseDir: String, viewDir: String, keys: Seq[String],
      value: String, maintenance: MaintenancePolicy): (Long, Boolean) = {
    val r = absorbEpoch(spark, batch, batchId, baseDir, viewDir, keys,
      value)
    Maintenance.onEpoch(spark, baseDir, batchId, maintenance)
    r
  }

  /** Metadata-only staleness of one view against one base table:
    * absorbed vs current version, the EXACT recorded row count of the
    * pending window (from the manifests' per-entry counts — zero data
    * reads), and whether the window folds or will force a recompute.
    * `deltaRows` is None exactly when the window is not foldable (a
    * rewrite/delete window's cost is the snapshot, not its delta). */
  final case class Freshness(absorbed: Long, current: Long,
      deltaRows: Option[Long], foldable: Boolean) {
    def behind: Long = current - absorbed
  }

  /** The [[Freshness]] of the base window this view has yet to absorb.
    * One manifest read per version in the window — the planning read a
    * refresh scheduler makes before spending any data I/O. */
  def freshness(spark: SparkSession, viewDir: String,
      baseDir: String): Freshness =
    windowFreshness(spark, baseDir, absorbed(spark, viewDir))

  /** [[Freshness]] of `dir`'s history from version `from` to its head —
    * shared by the agg and join view reports. */
  private[sinks] def windowFreshness(spark: SparkSession, dir: String,
      from: Long): Freshness = {
    val cur = ManifestSink.version(spark, dir)
    if (cur == from) return Freshness(from, cur, Some(0L), foldable = true)
    val (_, removed) = ManifestSink.changedEntries(spark, dir, from, cur)
    val fold = removed.isEmpty &&
      !ManifestSink.tombstonesAdded(spark, dir, from, cur)
    Freshness(from, cur,
      if (fold) ManifestSink.addedRows(spark, dir, from, cur) else None,
      fold)
  }

  /** The maintained state (raw IncrementalAgg schema). */
  def read(spark: SparkSession, viewDir: String): DataFrame =
    ManifestSink.read(spark, viewDir)

  /** The state in presentation form (n, sum_value, mn, mx). */
  def present(spark: SparkSession, viewDir: String,
      keys: Seq[String]): DataFrame =
    IncrementalAgg.present(read(spark, viewDir), keys)
}
