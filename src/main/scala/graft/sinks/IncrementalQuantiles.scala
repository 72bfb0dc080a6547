package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental per-group quantile maintenance over an append-only
  * [[ManifestSink]] history — the third member of the mergeable-state
  * family ([[IncrementalAgg]] sum/min/max scalars, [[IncrementalDistinct]]
  * KMV arrays, now order statistics). Exact quantiles are not mergeable
  * at all; the maintained state is the DETERMINISTIC bottom-k-by-hash
  * sample of [[graft.operators.Sampling]] (the q78 estimator): per group,
  * the k rows whose PortableHash(id) ranks smallest. That sample is an
  * order ideal under (hash, id), so it merges exactly like KMV — the
  * bottom k of a union is determined by each side's bottom k — and a
  * refresh samples ONLY the manifest-diff batches (rank-limit window:
  * map-side group limit, wide groups never reach a reducer whole).
  *
  * The folded state is bit-identical to sampling the whole table from
  * scratch, so quantile estimates drift ZERO from the batch q78 path as
  * the table grows — and the estimator stays cross-engine exact (q126
  * gates it against DuckDB). At 100 TB: daily quantile monitoring scans
  * one day's batches; state is k rows per group forever.
  */
object IncrementalQuantiles {

  /** Per-group sample state of one frame: (key, sample
    * array<struct<h,id,v>> sorted by (h, id)). `id` must be unique per
    * row (the (h, id) order is then total, making the sample unique). */
  def sampleState(df: DataFrame, key: String, id: String, value: String,
      k: Int): DataFrame =
    graft.operators.Sampling.bottomKByHash(
        df.select(col(key), col(id), col(value)), key, id, k)
      .groupBy(col(key))
      .agg(sort_array(collect_list(
        struct(col("h"), col(id).as("id"), col(value).as("v"))))
        .as("sample"))

  /** Merge two states built from DISJOINT row sets (append-only batches):
    * per group, the union's bottom k by (h, id). */
  def merge(a: DataFrame, b: DataFrame, key: String, k: Int): DataFrame =
    a.unionByName(b)
      .groupBy(col(key))
      .agg(slice(array_sort(flatten(collect_list(col("sample")))), 1, k)
        .as("sample"))

  /** State at `toV` from state at `fromV`: sample exactly the batches the
    * manifest diff names and fold them in. Refuses non-append histories
    * (a removed row may be IN the sample — unremovable without its
    * batch; recompute from the snapshot then). */
  def refresh(spark: SparkSession, state: Option[DataFrame], dir: String,
      fromV: Long, toV: Long, key: String, id: String, value: String,
      k: Int): DataFrame = {
    val (_, removed) = ManifestSink.changedEntries(spark, dir, fromV, toV)
    require(removed.isEmpty,
      s"history $fromV→$toV removed entries $removed: " +
        "recompute the sample from the snapshot instead")
    val delta = sampleState(
      ManifestSink.changes(spark, dir, fromV, toV), key, id, value, k)
    state.fold(delta)(st => merge(st, delta, key, k))
  }

  /** Exact quantiles OF THE SAMPLE (q78's estimator, bit-compatible with
    * DuckDB's quantile_cont): (key, n_sample, p50, p90, p99). */
  def present(state: DataFrame, key: String): DataFrame =
    state.select(col(key), explode(col("sample")).as("s"))
      .select(col(key), col("s.v").as("v"))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_sample"),
        percentile(col("v"), lit(0.5)).as("p50"),
        percentile(col("v"), lit(0.9)).as("p90"),
        percentile(col("v"), lit(0.99)).as("p99"))
}
