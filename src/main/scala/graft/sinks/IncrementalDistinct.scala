package graft.sinks

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.KmvSketch

/** Incremental per-group distinct-count maintenance over an append-only
  * [[ManifestSink]] history — [[IncrementalAgg]] for the ONE aggregate
  * family it can't cover: COUNT(DISTINCT) is not sum/min/max-mergeable
  * from scalars, but its KMV sketch IS mergeable from sketch CONTENT
  * (the order-ideal property: the k smallest distinct hashes of a union
  * are determined by each side's k smallest). So the maintained state is
  * (group, sorted array of ≤ k minima): a refresh sketches ONLY the
  * manifest-diff batches (map-side partial sketches, k longs per group
  * across the wire — [[graft.functions.KmvSketchValues]]) and folds them
  * into the stored state with a RELATIONAL merge (concat → distinct →
  * sort → first k), no custom code on the read side at all.
  *
  * Built on [[graft.functions.PortableHash]]-style deterministic hashes,
  * the folded state is bit-identical to a from-scratch sketch of the
  * whole table — so an external engine reproduces the estimate exactly
  * (q125 gates this). At 100 TB: a daily refresh scans one day's
  * arrivals; the state table holds k longs per group forever.
  */
object IncrementalDistinct {

  /** Per-group sketch state of one frame: (keys..., sketch array<long>).
    * `hashExpr` must evaluate to a uniform LongType hash of the counted
    * expression (e.g. `PortableHash.tokenHashP(col)`). */
  def sketchState(df: DataFrame, keys: Seq[String], hashExpr: Column,
      k: Int): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(KmvSketch.sketchValues(hashExpr, k).as("sketch"))

  /** Merge two states: groups present on either side; each group's
    * arrays union to the k smallest distinct values. Deterministic
    * whatever the collect order — distinct + sort happen after the
    * union, and the result is a pure function of the value SET. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String],
      k: Int): DataFrame =
    a.unionByName(b)
      .groupBy(keys.map(col): _*)
      .agg(slice(array_sort(array_distinct(
        flatten(collect_list(col("sketch"))))), 1, k).as("sketch"))

  /** State at `toV` from state at `fromV`: sketch exactly the batches
    * the manifest diff names and fold them in. Refuses non-append
    * histories — a removed batch can retract distinct values the sketch
    * cannot un-see (same contract as [[IncrementalAgg.refresh]]). */
  def refresh(spark: SparkSession, state: Option[DataFrame], dir: String,
      fromV: Long, toV: Long, keys: Seq[String], hashExpr: Column,
      k: Int): DataFrame = {
    val (_, removed) = ManifestSink.changedEntries(spark, dir, fromV, toV)
    require(removed.isEmpty,
      s"history $fromV→$toV removed entries $removed: " +
        "recompute the sketch from the snapshot instead")
    val delta = sketchState(
      ManifestSink.changes(spark, dir, fromV, toV), keys, hashExpr, k)
    state.fold(delta)(st => merge(st, delta, keys, k))
  }

  /** Estimate from state: n ≈ (k−1)·modulus / h_k when the sketch is
    * full, else the exact sketch size (same estimator as q27b). */
  def present(state: DataFrame, keys: Seq[String], k: Int,
      modulus: Long): DataFrame =
    state.select(keys.map(col) ++ Seq(
      size(col("sketch")).cast("long").as("n_sketch"),
      when(size(col("sketch")) >= k,
        lit((k - 1).toDouble * modulus) /
          element_at(col("sketch"), k).cast("double"))
        .otherwise(size(col("sketch")).cast("double"))
        .as("est_distinct")): _*)
}
