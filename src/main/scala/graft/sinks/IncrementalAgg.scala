package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance over an append-only
  * [[ManifestSink]] history: instead of recomputing a grouped aggregate
  * from the whole table after every commit, fold ONLY the new batches
  * (`ManifestSink.changes`) into the previous state — the classic
  * self-maintainable-view identity for the mergeable aggregate family
  * (count, sum, min, max). The sum accumulates in DECIMAL(38,4) inside
  * the state, so merge order can never perturb it; collapse to double
  * only when presenting.
  *
  * At 100 TB the difference is the whole point: a daily refresh touches
  * one day's batches (located by manifest diff, zero data reads to plan)
  * while the state table stays aggregate-sized. Deletions/merges are NOT
  * self-maintainable for min/max — [[refresh]] refuses histories with
  * removed entries rather than silently answering wrong (recompute from
  * the snapshot in that case, exactly what log-structured view
  * maintenance does on non-append commits).
  */
object IncrementalAgg {

  /** Grouped mergeable state of one frame: (keys, n, sum_dec, mn, mx). */
  def aggregate(df: DataFrame, keys: Seq[String],
      value: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(value).cast("decimal(38,4)")).as("sum_dec"),
        min(col(value)).as("mn"),
        max(col(value)).as("mx"))

  /** Merge two states: counts/sums add (decimal — exact in any order),
    * bounds combine. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("sum_dec")).as("sum_dec"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))

  /** State at `toV` from state at `fromV`: fold in exactly the batches
    * the manifest diff names. Refuses non-append histories (removed
    * entries ⇒ min/max are not incrementally maintainable). */
  def refresh(spark: SparkSession, state: DataFrame, dir: String,
      fromV: Long, toV: Long, keys: Seq[String],
      value: String): DataFrame = {
    val (_, removed) = ManifestSink.changedEntries(spark, dir, fromV, toV)
    require(removed.isEmpty,
      s"history $fromV→$toV removed entries $removed: " +
        "recompute the view from the snapshot instead")
    merge(state, aggregate(
      ManifestSink.changes(spark, dir, fromV, toV), keys, value), keys)
  }

  /** [[refresh]] with the self-healing fallback log-structured view
    * maintenance prescribes: an append-only window folds O(delta); a
    * window containing a rewrite (removed entries) or a merge-on-read
    * delete (a retraction no fold can absorb) RECOMPUTES the state from
    * the `toV` snapshot instead of refusing — the view keeps serving
    * through table maintenance, and subsequent append-only windows fold
    * incrementally again from the recomputed state. Returns
    * (state, folded) — `folded = false` marks the recompute paths so a
    * caller can account the full-scan cost. */
  def refreshOrRecompute(spark: SparkSession, state: DataFrame,
      dir: String, fromV: Long, toV: Long, keys: Seq[String],
      value: String): (DataFrame, Boolean) = {
    val (_, removed) = ManifestSink.changedEntries(spark, dir, fromV, toV)
    if (removed.nonEmpty ||
        ManifestSink.tombstonesAdded(spark, dir, fromV, toV))
      (aggregate(ManifestSink.readAt(spark, dir, toV), keys, value), false)
    else (refresh(spark, state, dir, fromV, toV, keys, value), true)
  }

  /** SUBTRACTABLE grouped state — (keys, n, sum_dec) without bounds.
    * Dropping min/max buys retraction-foldability: counts and exact
    * decimal sums invert (negative deltas), so a merge-on-read DELETE
    * window folds in O(retracted + delta) where the bounded state above
    * must recompute from the snapshot. Pick this state shape when the
    * view serves counts/sums/averages; keep [[aggregate]] when it must
    * also serve bounds. */
  def aggregateSums(df: DataFrame, keys: Seq[String],
      value: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"),
        sum(col(value).cast("decimal(38,4)")).as("sum_dec"))

  /** Merge two subtractable states: both fields add exactly (longs and
    * decimals), in any order — which is what makes negative deltas a
    * sound retraction. */
  def mergeSums(a: DataFrame, b: DataFrame,
      keys: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).cast("long").as("n"),
        sum(col("sum_dec")).as("sum_dec"))

  /** [[refreshOrRecompute]] for the subtractable state, with the third
    * arm classic view maintenance calls delta processing of deletions:
    * an append-only window folds the added batches (`mode = "fold"`); a
    * window that ALSO committed merge-on-read deletes folds the added
    * rows (tombstones applied) PLUS the retracted rows as a negative
    * delta ([[ManifestSink.retractedRows]] — O(affected entries), never
    * the snapshot; `mode = "retract_fold"`), dropping groups whose count
    * reaches zero; only a REWRITE window (removed entries) recomputes
    * (`mode = "recompute"`). Exactness: counts are longs and sums exact
    * decimals, so the subtraction cancels bit-for-bit — the folded state
    * is identical to the direct aggregate of the `toV` snapshot. */
  def refreshSums(spark: SparkSession, state: DataFrame, dir: String,
      fromV: Long, toV: Long, keys: Seq[String],
      value: String): (DataFrame, String) = {
    val (_, removed) = ManifestSink.changedEntries(spark, dir, fromV, toV)
    if (removed.nonEmpty)
      (aggregateSums(ManifestSink.readAt(spark, dir, toV), keys, value),
        "recompute")
    else {
      val plus = aggregateSums(
        ManifestSink.changesApplied(spark, dir, fromV, toV), keys, value)
      val folded = mergeSums(state, plus, keys)
      if (!ManifestSink.tombstonesAdded(spark, dir, fromV, toV))
        (folded, "fold")
      else {
        val minus = aggregateSums(
          ManifestSink.retractedRows(spark, dir, fromV, toV), keys, value)
          .select((keys.map(col) :+ (-col("n")).as("n") :+
            (-col("sum_dec")).as("sum_dec")): _*)
        (mergeSums(folded, minus, keys).filter(col("n") > 0),
          "retract_fold")
      }
    }
  }

  /** Presentation form of the subtractable state. */
  def presentSums(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select((keys.map(col) :+ col("n") :+
      col("sum_dec").cast("double").as("sum_value")): _*)

  /** Presentation form: exact decimal sum collapsed to double. */
  def present(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select((keys.map(col) :+ col("n") :+
      col("sum_dec").cast("double").as("sum_value") :+
      col("mn") :+ col("mx")): _*)

  /** Top-k presentation over maintained state: per `groupKeys`, the k
    * `rankKeys` rows with the largest decimal sum (ties broken by the
    * rank keys for a total, engine-identical order). This is how an
    * incremental leaderboard works at scale: the STATE is maintained
    * per (group, member) by the O(delta) fold — the expensive part —
    * and the top-k is a cheap rank over state rows, never over history.
    * The rank window prunes map-side (WindowGroupLimit), so wide state
    * groups never reach one reducer whole. */
  def presentTopK(state: DataFrame, groupKeys: Seq[String],
      rankKeys: Seq[String], k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupKeys.map(col): _*)
      .orderBy(col("sum_dec").desc +: rankKeys.map(c => col(c).asc): _*)
    state.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select((groupKeys ++ rankKeys).map(col) ++ Seq(
        col("rank").cast("long").as("rank"), col("n"),
        col("sum_dec").cast("double").as("sum_value")): _*)
  }
}
