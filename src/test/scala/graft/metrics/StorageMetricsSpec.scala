package graft.metrics

import java.nio.file.Files

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
}
