package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table-layout health from manifest METADATA alone — the storage-side
  * twin of `VectorOps.recommendIndex` (which maps a measured recall panel
  * to an index choice; this maps measured layout stats to a maintenance
  * action). At 100 TB the decisions that dominate scan cost — "compact
  * these small batches", "recluster, your batch ranges all overlap" — are
  * plannable from the stats every commit already wrote into its manifest
  * entry: per-batch row counts ([[ManifestSink.rowCount]]'s source) and
  * per-batch min/max of the sort column. Reading them costs one
  * small-file read per table; no data file is opened (the one
  * exception: a table whose entries predate row counts falls back to
  * one count over the data — absence of stats degrades cost, never
  * correctness, the same contract as the pruner's).
  *
  * Signals and the decision order:
  *   1. `compact` — mean batch size below `smallRows`: scan cost is
  *      dominated by per-file overhead (open/footer/seek), the classic
  *      small-file problem; compaction strictly helps whatever the
  *      clustering looks like, so it outranks `zorder`.
  *   2. `zorder` — batch [min,max] ranges on `statsCol` overlap: range
  *      scans cannot prune (every batch might hold matching rows), which
  *      is exactly what [[ManifestSink.compactZOrder]] repairs; counted
  *      as overlapping unordered batch pairs. A batch with no stats for
  *      `statsCol` is range-undecidable and counts as overlapping every
  *      other batch — the same conservative reading the pruner itself
  *      uses ([[ManifestSink.ColStats.overlaps]]).
  *   3. `healthy` — big batches, disjoint ranges: nothing to do.
  *
  * All arithmetic is integer (counts, integer-divided mean) so an
  * external engine reproduces the report bit-exactly. The per-table work
  * is manifest-entry-sized (one row per batch directory) — a
  * driver-local computation by design, like every other manifest
  * planning decision in [[ManifestSink]].
  */
object LayoutAdvisor {

  /** One report row per table: (table_name, n_batches, total_rows,
    * avg_batch_rows, overlap_pairs, recommendation). `tables` maps
    * display name → sink dir; `statsCol` is the clustering column whose
    * per-batch ranges are judged; `smallRows` is the mean-batch-size
    * floor under which compaction is recommended (callers derive it from
    * a target file size, or — scale-free — from a fraction of the
    * table's own row count). */
  def report(spark: SparkSession, tables: Seq[(String, String)],
      statsCol: String, smallRows: Long): DataFrame =
    report(spark, tables, Seq(statsCol), smallRows)

  /** Multi-column form: a batch pair counts as overlapping only when
    * its ranges overlap on EVERY column of `statsCols` — the exact
    * condition under which a conjunctive range query can co-scan both
    * batches (overlap on one column alone never defeats pruning if
    * another column separates them, so counting it would misdiagnose a
    * column-striped layout as needing recluster). A batch missing stats
    * for a column is range-undecidable ON THAT COLUMN and counts as
    * overlapping there — the pruner's own conservative reading
    * ([[ManifestSink.ColStats.overlaps]]). With one column this reduces
    * to the single-column rule exactly. */
  def report(spark: SparkSession, tables: Seq[(String, String)],
      statsCols: Seq[String], smallRows: Long): DataFrame = {
    require(statsCols.nonEmpty, "report requires at least one stats column")
    val rows = tables.map { case (name, dir) =>
      val v = ManifestSink.version(spark, dir)
      require(v >= 0, s"LayoutAdvisor: no committed version at $dir")
      // merge-on-read tombstone entries are keys, not data layout: they
      // would read as stats-less batches (= overlap everything) and
      // manufacture a zorder verdict for a perfectly clustered table
      val entries = ManifestSink.entries(spark, dir, v)
        .filterNot(ManifestSink.isTombEntry)
      val nb = entries.size.toLong
      val total = ManifestSink.rowCount(spark, dir).getOrElse(
        ManifestSink.read(spark, dir).count())
      val bounds = entries.map(e => statsCols.map(e.stats.get))
      val overlapPairs = bounds.zipWithIndex.map { case (a, i) =>
        bounds.drop(i + 1).count { b =>
          a.zip(b).forall {
            case (Some(sa), Some(sb)) =>
              sa.overlaps(Some(sb.min), Some(sb.max))
            case _ => true // stats-less on this column: undecidable
          }
        }.toLong
      }.sum
      val avg = if (nb == 0) 0L else total / nb
      val rec =
        if (avg < smallRows) "compact"
        else if (overlapPairs > 0) "zorder"
        else "healthy"
      (name, nb, total, avg, overlapPairs, rec)
    }
    spark.createDataFrame(rows).toDF("table_name", "n_batches",
      "total_rows", "avg_batch_rows", "overlap_pairs", "recommendation")
  }

  /** MoR-debt maintenance — the hygiene loop [[ManifestSink
    * .mergeOnRead]] and the MoR deletes defer their read cost to: every
    * tombstone is an extra filter/anti-join segment in the assembled
    * scan, so once a table's tombstone count
    * ([[ManifestSink.tombstoneDebt]] — one manifest read, zero data)
    * exceeds `maxTombstones`, its snapshot is compacted (tombstones
    * materialize away, bare-scan plan restored, content identical,
    * previous versions still time-travel). Under-debt tables see no
    * commit. Returns (table_name, tombstones, data_entries, action). */
  def maintainTombstoneDebt(spark: SparkSession,
      tables: Seq[(String, String)], maxTombstones: Int,
      statsCols: Seq[String] = Nil): DataFrame = {
    val acted = tables.map { case (name, dir) =>
      val (t, d) = ManifestSink.tombstoneDebt(spark, dir)
      val action =
        if (t > maxTombstones) {
          ManifestSink.compact(spark, dir, statsCols = statsCols)
          "compacted"
        } else "none"
      (name, t.toLong, d.toLong, action)
    }
    spark.createDataFrame(acted)
      .toDF("table_name", "tombstones", "data_entries", "action")
  }

  /** Act on the report — the self-maintaining-table loop. With one
    * stats column, `compact` and `zorder` verdicts both run
    * [[ManifestSink.compact]] clustered on it (for a single clustering
    * dimension a sorted rewrite IS the recluster — tight, disjoint
    * ranges in one batch). `healthy` tables are not touched (no commit,
    * no version bump). Returns the pre-maintenance report plus an
    * `action` column recording what ran — re-run [[report]] afterwards
    * to observe the layout go healthy. Each rewrite is one distributed
    * job committing against a pinned version (concurrent appends fail
    * the maintenance commit loudly, never the other way around). */
  def applyRecommendations(spark: SparkSession,
      tables: Seq[(String, String)], statsCol: String,
      smallRows: Long): DataFrame =
    applyRecommendations(spark, tables, Seq(statsCol), smallRows)

  /** Multi-column form: a `zorder` verdict runs the REAL
    * [[ManifestSink.compactZOrder]] on `statsCols` (action `zordered`),
    * equi-depth: dimensions with committed histograms get skew-proof
    * quantile cells (metadata-only — the advisor never re-reads data to
    * plan), the rest degrade to linear per-dimension. This closes the
    * loop the conjunctive report opens: any two
    * distinct z-bucket entries differ somewhere in their z-prefix, the
    * highest differing bit belongs to some dimension whose cell bits
    * above it agree — so that dimension's cells (and hence value
    * ranges) are disjoint (quantile cells are still contiguous value
    * ranges), the pair cannot conjunctively overlap, and
    * the post-maintenance report is `healthy` by construction. A
    * `compact` verdict (small files dominate, clustering secondary)
    * keeps the single-job lexicographic sorted rewrite. */
  def applyRecommendations(spark: SparkSession,
      tables: Seq[(String, String)], statsCols: Seq[String],
      smallRows: Long): DataFrame = {
    val dirByName = tables.toMap
    val rep = report(spark, tables, statsCols, smallRows).collect()
    val acted = rep.map { r =>
      val name = r.getString(0)
      val action = r.getString(5) match {
        case "zorder" if statsCols.size >= 2 =>
          ManifestSink.compactZOrder(spark, dirByName(name),
            zCols = statsCols, statsCols = statsCols, equiDepth = true)
          "zordered"
        case "compact" | "zorder" =>
          ManifestSink.compact(spark, dirByName(name),
            statsCols = statsCols, sortCols = statsCols)
          "compacted_sorted"
        case _ => "none"
      }
      (name, r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getString(5), action)
    }.toSeq
    spark.createDataFrame(acted).toDF("table_name", "n_batches",
      "total_rows", "avg_batch_rows", "overlap_pairs", "recommendation",
      "action")
  }
}
