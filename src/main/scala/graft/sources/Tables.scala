package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet tables (repo:TESTDATA.md).
  *
  * Each scale-factor directory holds one parquet file per table. At cluster
  * scale these would be partitioned directories (or a catalog table); the
  * loader is the single seam where that changes — every operator goes
  * through here, so swapping in `spark.table(name)` or a partitioned path
  * touches one line.
  */
object Tables {
  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = read(spark, s"$dir/$name.parquet")
    // events.ts is TIMESTAMP(NANOS) parquet, which Spark 4 refuses natively
    // (PARQUET_TYPE_ILLEGAL) — it arrives as a ns-since-epoch long via the
    // legacy conf below; truncate to µs TimestampType (floor, matching how
    // second-resolution formatting behaves in both engines).
    if (name == "events" && df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }

  private def read(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
  }
}
