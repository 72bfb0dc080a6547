package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.broadcast

/** Incrementally-maintained materialized JOIN view over two append-only
  * [[ManifestSink]] tables — the two-table member of the incremental-view
  * family ([[IncrementalAgg]] / [[IncrementalDistinct]] /
  * [[IncrementalQuantiles]] maintain single-table state; a join view
  * needs the delta-join identity instead):
  *
  * {{{ Δ(L ⋈ R) = ΔL ⋈ R_new  ∪  L_old ⋈ ΔR }}}
  *
  * (`ΔL ⋈ ΔR` lands exactly once — inside the first term, because
  * `R_new ⊇ ΔR`, and never in the second, because `L_old` predates
  * `ΔL`.) The view is itself a ManifestSink table: [[create]] commits
  * the full join once, every [[refresh]] appends ONLY the delta rows,
  * and the source versions the view has absorbed ride the view's own
  * manifest HEADER — so the fold position is recorded in the SAME
  * atomic commit as the delta rows it accounts for (a crash between
  * "append delta" and "advance positions" cannot exist, and the
  * monotone numeric header merge makes a replayed refresh rebase
  * correctly under concurrent view writers).
  *
  * At 100 TB this is the point of a materialized join: a daily refresh
  * joins one day's batches against the other table — O(delta·R) with
  * the delta side BROADCAST when the manifest's recorded row counts
  * (zero data reads) say it fits — instead of re-joining 100 TB against
  * 100 TB. Because the view is a normal sink table, the single-table
  * incremental views stack on top of it: an [[IncrementalAgg]] over the
  * view's own manifest history maintains an aggregate-over-a-join with
  * BOTH levels folding O(delta).
  *
  * Non-append windows (a rewrite, a merge-on-read delete, a source
  * rollback) are retractions no file-level fold can absorb: [[refresh]]
  * RECOMPUTES the view from the current snapshots (`folded = false`) —
  * the view keeps serving through table maintenance, and later
  * append-only windows fold incrementally from the recomputed state.
  * After a source ROLLBACK the monotone header keeps the old (higher)
  * absorbed version, so every refresh recomputes until the source
  * passes it again — conservatively correct, never silently stale.
  *
  * Reference behavior analog: the reference app keeps per-table derived
  * state refreshed per commit cycle (etl.py's loop); this lifts that
  * idea to cross-table derived state with O(delta) maintenance.
  */
object IncrementalJoinView {

  private val LeftVKey = "ivj_left_v"
  private val RightVKey = "ivj_right_v"

  /** The join contract: both frames share EXACTLY the key column.
    * Loud refusal beats Spark's silent duplicate output columns. */
  private def requireDisjoint(l: DataFrame, r: DataFrame,
      key: String): Unit = {
    val shared = l.columns.toSet.intersect(r.columns.toSet)
    require(shared == Set(key),
      s"join view requires the sides to share exactly the key '$key'; " +
        s"shared columns: ${shared.toSeq.sorted.mkString(", ")} — " +
        "rename or project the collision away")
  }

  private def fullJoin(spark: SparkSession, leftDir: String,
      rightDir: String, key: String, vL: Long, vR: Long): DataFrame = {
    val l = ManifestSink.readAt(spark, leftDir, vL)
    val r = ManifestSink.readAt(spark, rightDir, vR)
    requireDisjoint(l, r, key)
    l.join(r, Seq(key))
  }

  private def positions(h: Map[String, String],
      viewDir: String): (Long, Long) = (
    h.getOrElse(LeftVKey, sys.error(
      s"$viewDir has no $LeftVKey header — not a join view")).toLong,
    h.getOrElse(RightVKey, sys.error(
      s"$viewDir has no $RightVKey header — not a join view")).toLong)

  private def posHeader(vL: Long, vR: Long): Map[String, String] =
    Map(LeftVKey -> vL.toString, RightVKey -> vR.toString)

  /** Materialize `left ⋈ right` on `key` (inner equi-join, shared-name
    * key, disjoint payload columns) as a new view table at `viewDir`,
    * recording the absorbed source versions in the view's header.
    * Returns the view's committed version (0). */
  def create(spark: SparkSession, viewDir: String, leftDir: String,
      rightDir: String, key: String): Long = {
    require(ManifestSink.version(spark, viewDir) < 0,
      s"join view $viewDir already exists — use refresh")
    val vL = ManifestSink.version(spark, leftDir)
    val vR = ManifestSink.version(spark, rightDir)
    require(vL >= 0 && vR >= 0,
      s"both sources must be committed tables ($leftDir=$vL, $rightDir=$vR)")
    ManifestSink.appendWithHeader(
      fullJoin(spark, leftDir, rightDir, key, vL, vR), viewDir,
      posHeader(vL, vR))
  }

  /** The (left, right) source versions the view has absorbed — read from
    * the view's current manifest header (one small-file read). */
  def sourceVersions(spark: SparkSession, viewDir: String): (Long, Long) =
    positions(ManifestSink.manifestHeader(spark, viewDir,
      ManifestSink.version(spark, viewDir)), viewDir)

  /** Advance the view to the sources' CURRENT versions. Append-only
    * windows on both sides fold the delta-join identity — the only data
    * read is each side's new batches plus the opposite snapshot, with
    * the delta side broadcast when the manifest's recorded added-row
    * count is ≤ `broadcastRows` (the size check costs zero data reads).
    * Any non-append window recomputes from the snapshots instead.
    * Returns (view version, folded) — `folded = false` marks the
    * recompute path so a caller can account the full-join cost. */
  def refresh(spark: SparkSession, viewDir: String, leftDir: String,
      rightDir: String, key: String,
      broadcastRows: Long = 1000000L): (Long, Boolean) = {
    val vView = ManifestSink.version(spark, viewDir)
    require(vView >= 0, s"join view $viewDir does not exist — use create")
    val (vL, vR) =
      positions(ManifestSink.manifestHeader(spark, viewDir, vView), viewDir)
    val vL2 = ManifestSink.version(spark, leftDir)
    val vR2 = ManifestSink.version(spark, rightDir)
    if (vL2 == vL && vR2 == vR) return (vView, true)

    def foldable(dir: String, from: Long, to: Long): Boolean =
      from <= to && {
        val (_, removed) = ManifestSink.changedEntries(spark, dir, from, to)
        removed.isEmpty && !ManifestSink.tombstonesAdded(spark, dir, from, to)
      }
    if (!foldable(leftDir, vL, vL2) || !foldable(rightDir, vR, vR2)) {
      // a rewrite / MoR delete / rollback in the window is a retraction
      // no file-level fold can absorb — recompute, keep serving
      (ManifestSink.replaceWithHeader(
        fullJoin(spark, leftDir, rightDir, key, vL2, vR2), viewDir,
        posHeader(vL2, vR2)), false)
    } else {
      def delta(dir: String, from: Long, to: Long): DataFrame = {
        val d = ManifestSink.changes(spark, dir, from, to)
        if (ManifestSink.addedRows(spark, dir, from, to)
            .exists(_ <= broadcastRows)) broadcast(d)
        else d
      }
      val terms = Seq.newBuilder[DataFrame]
      if (vL2 > vL) {
        val rNew = ManifestSink.readAt(spark, rightDir, vR2)
        val dL = ManifestSink.changes(spark, leftDir, vL, vL2)
        requireDisjoint(dL, rNew, key)
        terms += delta(leftDir, vL, vL2).join(rNew, Seq(key))
      }
      if (vR2 > vR) {
        val lOld = ManifestSink.readAt(spark, leftDir, vL)
        val dR = ManifestSink.changes(spark, rightDir, vR, vR2)
        requireDisjoint(lOld, dR, key)
        terms += lOld.join(delta(rightDir, vR, vR2), Seq(key))
      }
      (ManifestSink.appendWithHeader(
        terms.result().reduce(_ unionByName _), viewDir,
        posHeader(vL2, vR2)), true)
    }
  }

  /** Per-epoch STREAMING maintenance of the JOIN view — the
    * `foreachBatch` body for the "streaming fact ⋈ maintained
    * dimension" shape: append the epoch to the LEFT (fact) table
    * exactly-once ([[ManifestSink.appendOnce]], idempotent under Spark
    * epoch replay), then fold the view. Replay safety composes exactly
    * as in [[AggMatView.absorbEpoch]]: a replayed epoch's append is a
    * no-op, so the left position does not advance and the refresh sees
    * equal positions — the delta-join cannot double-absorb at any
    * crash point. Because [[refresh]] folds BOTH windows, dimension
    * commits made between epochs by other writers are absorbed in the
    * same call (the `L_old ⋈ ΔR` term), so the view tracks both a live
    * stream and a slowly-changing dimension with no extra machinery.
    * Returns (view version, folded). */
  def absorbEpoch(spark: SparkSession, batch: DataFrame, batchId: Long,
      leftDir: String, viewDir: String, rightDir: String, key: String,
      broadcastRows: Long = 1000000L): (Long, Boolean) = {
    ManifestSink.appendOnce(batch, leftDir, batchId)
    if (ManifestSink.version(spark, viewDir) < 0)
      (create(spark, viewDir, leftDir, rightDir, key), true)
    else refresh(spark, viewDir, leftDir, rightDir, key, broadcastRows)
  }

  /** Metadata-only staleness of the join view against both sources:
    * each side's absorbed-to-current window as an
    * [[AggMatView.Freshness]] (exact recorded delta rows, foldability) —
    * the planning read a refresh scheduler makes before spending data
    * I/O: `deltaRows` is exactly the size of the `Δ side` a fold would
    * join, and a non-foldable side means the refresh recomputes. */
  def freshness(spark: SparkSession, viewDir: String, leftDir: String,
      rightDir: String): (AggMatView.Freshness, AggMatView.Freshness) = {
    val (vL, vR) = sourceVersions(spark, viewDir)
    (AggMatView.windowFreshness(spark, leftDir, vL),
      AggMatView.windowFreshness(spark, rightDir, vR))
  }

  /** The maintained view content (the normal assembled read — the view
    * is a first-class sink table). */
  def read(spark: SparkSession, viewDir: String): DataFrame =
    ManifestSink.read(spark, viewDir)
}
