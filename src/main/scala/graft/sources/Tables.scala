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

  private val NanosConf = "spark.sql.legacy.parquet.nanosAsLong"

  /** Reads with nanosAsLong enabled for JUST this read: the previous
    * session value is restored afterwards, so loading a table never
    * changes ns-timestamp handling for unrelated reads in the session.
    * (The conf is session-wide, not a per-read option, hence save/restore;
    * the eagerly-resolved schema is pinned at `spark.read` time.) */
  private def read(spark: SparkSession, path: String): DataFrame = {
    val prev = spark.conf.getOption(NanosConf)
    spark.conf.set(NanosConf, "true")
    try spark.read.parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set(NanosConf, v)
      case None    => spark.conf.unset(NanosConf)
    }
  }
}
