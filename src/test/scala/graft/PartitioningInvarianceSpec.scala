package graft

/** The determinism engineering's core claim, tested head-on: results are
  * BIT-identical under different physical partitioning. Decimal-accumulated
  * aggregates (Exact), hash-based sampling (PortableHash), window
  * tie-breaks, and LSH bucketing are all designed to be order-free; if any
  * of them silently depended on partition count, a cluster resize — or the
  * jump from local[32] to 1000 executors — would change answers. The
  * oracle gate can't see this (DuckDB runs single-engine); this spec can.
  */
class PartitioningInvarianceSpec extends SparkSpec {

  // one representative per determinism mechanism:
  //   q01  decimal-sum aggregates      q16  sqrt-derived rounded stats
  //   q55  rounded-score window ranks  q78  hash-sampled quantiles
  //   q81  gate→LSH→decontaminate pipeline (windows + broadcast joins)
  //   q94  PQ encode→ADC shortlist→re-rank (sequential-dot tie-breaks)
  //   q115 decode→dHash→Hamming-banded pairs (bandSelfJoin + expansion)
  //   q116 audio decode→fingerprint→the same banded kernel from a second
  //        modality (mapPartitions codec seam + capped self-join)
  //   q123 video signatures (sorted frame-hash arrays grouped/banded as
  //        keys — array collect must sort before any grouping for the
  //        signature to be partition-order-free)
  //   q125 mergeable-state fold (KMV arrays built per batch then merged
  //        relationally — collect_list order must wash out in the
  //        distinct+sort+slice)
  //   q132 merge-on-read assembled scan (position-segmented tombstone
  //        anti-joins + decimal aggregate — the delete must erase the
  //        same rows whatever the physical partitioning)
  //   q143 prefix-filter exact similarity join (global-df rank windows
  //        feeding the capped self-join — the prefix SET must be
  //        identical whatever partitioning computed the frequencies)
  //   q151 asymmetric containment (per-doc prefix windows + the capped
  //        probe×index join + in-reducer bitmap verify — three stages
  //        whose partial orders must all wash out)
  //   q155 sharded sweep-line prefix sums (the within-hour running sums
  //        have tie groups whose ORDER is partition-dependent — only
  //        the emitted max/entering values may not be)
  //   q158 multiprobe banding (13× probe index + first-collapse)
  //   q161 container decode → sampled frame signatures (GIF seam +
  //        sorted-signature grouping)
  //   q189 equi-depth histogram build → merged cuts → balanced rewrite
  //        (order statistics off a distinct-value cum window, integer
  //        mass accumulation, shard classification — boundaries, cuts,
  //        and per-shard counts must not see physical partitioning)
  //   q192 per-class hash-rank top-k through WindowGroupLimit (the
  //        map-side group limit must elect the same k rows whatever
  //        partial limits each task computed)
  //   q211 model-frame scoring (two-class hashed-feature histograms →
  //        6-dp-rounded DECIMAL LLR sums — the class counts, totals,
  //        and per-doc folds must all be partition-order-free)
  //   q215 learned-structure sampling (centroid-assignment rank windows
  //        feeding a cells-sized rate frame + hash admission — the cell
  //        assignment and the 1-row min probe must not see partitioning)
  private val representatives = Seq(
    "q01_pricing_summary", "q16_exact_stats", "q55_tfidf_top_terms",
    "q78_sampled_quantiles", "q81_curation_pipeline", "q94_ann_pq",
    "q115_image_phash_dedup", "q116_audio_fingerprint_dedup",
    "q123_video_near_dup", "q125_incremental_distinct",
    "q132_mor_delete", "q143_exact_prefix_join",
    "q151_containment_join", "q155_concurrency_curve",
    "q158_simhash_multiprobe", "q161_gif_video_near_dup",
    "q189_balanced_layout", "q192_balanced_sample",
    "q211_dsir_selection", "q215_cluster_balanced")

  test("results are bit-identical across shuffle-partition counts") {
    val key = "spark.sql.shuffle.partitions"
    val saved = spark.conf.get(key)
    def runAll(): Map[String, Seq[String]] =
      representatives.map { q =>
        q -> SparkEntry.queries(q)(spark, sf).collect().map(_.toString).toSeq
      }.toMap
    try {
      spark.conf.set(key, "3")
      val narrow = runAll()
      spark.conf.set(key, "29")
      val wide = runAll()
      representatives.foreach { q =>
        assert(narrow(q) === wide(q), s"$q differs across partitionings")
        assert(narrow(q).nonEmpty)
      }
    } finally spark.conf.set(key, saved)
  }
}
