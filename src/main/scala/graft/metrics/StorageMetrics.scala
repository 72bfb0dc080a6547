package graft.metrics

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** O5 disk-usage metric (db_helper.py:3-6): the dashboard's storage
  * footprint tile, generalized from one SQLite file to a sink directory
  * tree via the Hadoop FS API (works for local FS, HDFS, object stores). */
object StorageMetrics {
  def diskUsageMiB(spark: SparkSession, path: String): Double = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0.0
    else fs.getContentSummary(p).getLength / 1024.0 / 1024.0
  }
}
