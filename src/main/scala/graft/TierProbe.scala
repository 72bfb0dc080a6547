package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway tier probe for the r13 scale sweep: time containment /
  * prefix joins at base and x10 under BOTH verify tiers, to separate
  * "tier flip constant" from genuine superlinearity. */
object TierProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.DedupOps
    def run(tag: String, dir: String, vocabCap: Long): Unit = {
      val sets = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"),
          DedupOps.shingles(split(col("text"), " "), 2).as("sh"))
      def time(name: String, f: => Long): Unit = {
        val t0 = System.nanoTime()
        val n = f
        println(f"""{"probe":"$tag","op":"$name","cap":$vocabCap,""" +
          f""""sec":${(System.nanoTime() - t0) / 1e9}%.2f,"rows":$n}""")
        spark.sharedState.cacheManager.clearCache()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(false))
      }
      time("containment", DedupOps.containmentJoin(sets, "doc_id", "sh",
        4, 5, minSize = 5, bitmapMaxVocab = vocabCap).count())
      time("prefix", DedupOps.prefixSimilarityJoin(sets, "doc_id", "sh",
        4, 5, bitmapMaxVocab = vocabCap).count())
    }
    for (cap <- Seq(1L, 1L << 16)) {
      run("base", "/root/testdata/sf0.1", cap)
      run("x10", "/tmp/graft-sf1", cap)
    }
    spark.stop()
  }
}
