package graft.sinks

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Sink-side physical layout (K5/K6, SURVEY.md §2.2/§4).
  *
  * The reference's secondary index on event_timestamp (pipeline.py:220)
  * has no direct parquet equivalent; the idiomatic analog is sorting
  * within partitions on the probe column before writing — parquet
  * row-group min/max statistics then prune reads the way the B-tree did,
  * and date partitioning prunes whole files. At 100 TB this is the
  * difference between scanning a day and scanning the lake.
  */
object ParquetSink {

  /** Append with row-group-level ordering on `sortCols` (the K6 "index"). */
  def appendSorted(df: DataFrame, path: String, sortCols: Seq[String]): Unit =
    df.sortWithinPartitions(sortCols.map(df.col): _*)
      .write.mode("append").parquet(path)

  /** Append partitioned by a derived date column + sorted within partitions
    * — the full time-series layout (partition pruning + stats pruning). */
  def appendTimePartitioned(df: DataFrame, path: String, tsCol: String): Unit = {
    import org.apache.spark.sql.functions._
    df.withColumn("__event_date", to_date(col(tsCol)))
      .sortWithinPartitions(col(tsCol))
      .write.mode("append").partitionBy("__event_date").parquet(path)
  }

  /** Write a bucketed+sorted catalog table: joins and aggregations on the
    * bucket key between co-bucketed tables need NO shuffle — the
    * pre-partitioning is the 100 TB lever for repeated fact-fact joins
    * (pay the shuffle once at write time, never again at read). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int): Unit =
    // repartition on the bucket key first: V1 bucketed writes do not
    // enforce a distribution, so every input partition otherwise writes
    // one file per bucket it touches — numBuckets × input-partitions
    // small files (the small-files trap, guide §6). repartition(n, col)
    // and the bucket id share the same murmur3-pmod assignment, so each
    // task holds exactly one bucket and writes exactly one file; the
    // shuffle added here IS the pay-once shuffle this layout exists to
    // amortize (r17).
    df.repartition(numBuckets, org.apache.spark.sql.functions.col(bucketCol))
      .write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(table)

  /** R1 retention at scale: drop whole date partitions older than
    * `cutoff` from an [[appendTimePartitioned]] sink. Deleting a
    * partition directory is a metadata-sized operation — no data rewrite,
    * unlike the compact-and-swap a flat sink needs
    * (WikiStream.appendWithRetention); with a Delta-style table this is
    * literally `DELETE WHERE date < cutoff`. Time-based retention rather
    * than the reference's row-count cap: at 100 TB "keep newest N rows"
    * is itself expressed as a date cutoff. Returns the dropped dates. */
  def dropPartitionsBefore(spark: SparkSession, path: String,
      cutoff: java.time.LocalDate): Seq[String] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Nil
    val Part = "__event_date=(\\d{4}-\\d{2}-\\d{2})".r
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .flatMap(st => st.getPath.getName match {
        case Part(d) if java.time.LocalDate.parse(d).isBefore(cutoff) =>
          require(fs.delete(st.getPath, true),
            s"failed to drop partition ${st.getPath}")
          Some(d)
        case _ => None
      }).sorted
  }
}
