package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
