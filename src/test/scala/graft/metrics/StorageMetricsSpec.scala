package graft.metrics

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec

class StorageMetricsSpec extends SparkSpec {
  import spark.implicits._

  test("disk usage reflects written sink bytes; missing path is 0") {
    val dir = Files.createTempDirectory("du").toString + "/sink"
    assert(StorageMetrics.diskUsageMiB(spark, dir) === 0.0)
    spark.range(0, 10000).toDF("v").write.parquet(dir)
    val mib = StorageMetrics.diskUsageMiB(spark, dir)
    assert(mib > 0.0 && mib < 10.0)
  }

  test("dashboard snapshot computes the reference's three tiles") {
    val dir = Files.createTempDirectory("dash").toString + "/sink"
    val rows = Seq(
      Timestamp.valueOf("2024-01-01 10:00:00"),
      Timestamp.valueOf("2024-01-01 10:58:30"),
      Timestamp.valueOf("2024-01-01 10:59:30"),
      Timestamp.valueOf("2024-01-01 11:00:00")
    ).toDF("event_timestamp")
    rows.write.parquet(dir)
    val snap = Dashboard.snapshot(spark, dir)
    assert(snap.latestEventTime ===
      Some(Timestamp.valueOf("2024-01-01 11:00:00")))
    assert(snap.totalRows === 4L)
    // last minute = [10:59:00, 11:00:00] inclusive → 2 events
    assert(snap.eventsLastMinute === 2L)
    assert(snap.diskUsageMiB > 0.0)
  }
}
