package graft.metrics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference dashboard's poll loop (dashboard.py:37-75) as one batch
  * snapshot over a wiki_events sink: the three metric tiles — newest id
  * analog, total rows, ingestion velocity — plus the O5 storage footprint.
  *
  * Deliberate semantic upgrades (SURVEY.md §1.4.1): "total rows" is
  * `count(*)` not `MAX(id)-MIN(id)+1` (no gap-free autoincrement exists in
  * a distributed sink), and velocity is events/minute over the newest
  * minute of `event_timestamp` instead of Δmax-id between polls — same
  * intent, well-defined under retention and replay. The delta-vs-previous
  * rendering (A7) falls out of calling this on the dashboard's 5 s cadence
  * and diffing snapshots, exactly like the reference's per-tick deltas.
  */
object Dashboard {

  final case class Snapshot(latestEventTime: Option[java.sql.Timestamp],
      totalRows: Long, eventsLastMinute: Long, diskUsageMiB: Double)

  /** One poll tick over the sink directory. */
  def snapshot(spark: SparkSession, sinkDir: String): Snapshot = {
    val sink = spark.read.parquet(sinkDir)
    val row = metricsFrame(sink).head()
    Snapshot(
      Option(row.getAs[java.sql.Timestamp]("latest_event_time")),
      row.getAs[Long]("total_rows"),
      row.getAs[Long]("events_last_minute"),
      StorageMetrics.diskUsageMiB(spark, sinkDir))
  }

  /** The metric tiles as a 1-row DataFrame (composable / testable without
    * the driver-side collect). The scalar max travels via a 1-row
    * broadcast, not a driver collect (same pattern as WikiIngest.retention). */
  def metricsFrame(sink: DataFrame): DataFrame = {
    val mx = sink.agg(max(col("event_timestamp")).as("__max_ts"))
    sink.crossJoin(broadcast(mx)).agg(
      max(col("event_timestamp")).as("latest_event_time"),
      count(lit(1)).as("total_rows"),
      count(when(col("event_timestamp") >=
          col("__max_ts") - expr("INTERVAL 1 MINUTE"), 1))
        .as("events_last_minute"))
  }
}
