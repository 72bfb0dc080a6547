package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.concurrent.TrieMap

/** Builder tooling (not driver contract): run ONE registry query once and
  * print every Spark job it ran — id, wall, description/callsite — plus the
  * construction-vs-count split. Finds where a write gate's wall actually
  * goes (the returned frame's plan shows none of the construction jobs).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.JobProfile \
  *     /root/testdata/sf0.1 q194_scd2_dimension"
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = TrieMap.empty[Int, (Long, String)]
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Double, String)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        starts.put(js.jobId, (js.time, desc))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach { case (t0, desc) =>
          rows.add((je.jobId, (je.time - t0) / 1e3, desc))
        }
    })
    val fn = SparkEntry.queries(name)
    // warm once at the smallest SF so JIT/codegen noise doesn't swamp the
    // job table (mirrors the bench's warmup)
    try fn(spark, "/root/testdata/sf0.001").count()
    catch { case scala.util.control.NonFatal(_) => () }
    Thread.sleep(500)
    rows.clear()
    val t0 = System.nanoTime()
    val df = fn(spark, sfDir)
    val tBuild = (System.nanoTime() - t0) / 1e9
    val n = df.count()
    val tTotal = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500) // let listener events drain
    println(f"[jobprofile] $name rows=$n build=$tBuild%.3f total=$tTotal%.3f")
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq.sortBy(_._1)
    all.foreach { case (id, sec, desc) =>
      println(f"[jobprofile]   job $id%4d  $sec%8.3f s  ${desc.take(110)}")
    }
    println(f"[jobprofile] jobs=${all.size} jobSum=${all.map(_._2).sum}%.3f")
    spark.stop()
  }
}
