package graft.sinks

import org.apache.spark.sql.SparkSession

/** Builder tooling (temporary): time the ManifestSink append path's
  * components — the write job vs the driver-side rest — over N appends. */
object SinkProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    
    val root = java.nio.file.Files.createTempDirectory("sinkprobe").toString
    val df = spark.range(0L, 100000L, 1L, 4).selectExpr("id", "id % 7 AS v")
    // warm
    ManifestSink.append(df, s"$root/warm")
    val n = 20
    val t0 = System.nanoTime()
    (1 to n).foreach(_ => ManifestSink.append(df, s"$root/t"))
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[sinkprobe] $n appends: total=$dt%.3f s, per-append=${dt / n}%.4f s")
    // split: bare parquet write of the same frame, same file count
    val t1 = System.nanoTime()
    (1 to n).foreach(i => df.write.parquet(s"$root/bare/$i"))
    val dt1 = (System.nanoTime() - t1) / 1e9
    println(f"[sinkprobe] $n bare writes: total=$dt1%.3f s, per=${dt1 / n}%.4f s")
    // split: bare write with the Observation count attached
    import org.apache.spark.sql.functions.{count, lit}
    val t2 = System.nanoTime()
    (1 to n).foreach { i =>
      val obs = org.apache.spark.sql.Observation()
      df.observe(obs, count(lit(1)).as("n")).write.parquet(s"$root/obs/$i")
      obs.get("n")
    }
    val dt2 = (System.nanoTime() - t2) / 1e9
    println(f"[sinkprobe] $n observed writes: total=$dt2%.3f s, per=${dt2 / n}%.4f s")
    // pure metadata commits: no data write at all
    val m = 100
    val t3 = System.nanoTime()
    (1 to m).foreach { _ =>
      ManifestSink.commitAppendLines(spark, s"$root/meta", Seq("data/x"),
        Map.empty)
    }
    val dt3 = (System.nanoTime() - t3) / 1e9
    println(f"[sinkprobe] $m metadata-only commits: total=$dt3%.3f s, per=${dt3 / m}%.4f s")
    // version() probe cost on the resulting table
    val t4 = System.nanoTime()
    (1 to m).foreach(_ => ManifestSink.version(spark, s"$root/meta"))
    val dt4 = (System.nanoTime() - t4) / 1e9
    println(f"[sinkprobe] $m version() probes: total=$dt4%.3f s, per=${dt4 / m}%.4f s")
    spark.stop()
  }
}
