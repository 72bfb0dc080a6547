package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode
import scala.util.control.NonFatal

/** Builder tooling (not driver contract): dump `.explain("formatted")` for
  * registry queries to files, for the plans/rNN before/after evidence.
  *
  *   SPARK_GRAFT_PLAN_ONLY=q01_pricing_summary,q02_revenue_by_nation \
  *     sbt "runMain graft.PlanDump /root/testdata/sf0.01 /root/repo/plans/r17 _before"
  *
  * Write-gate queries mutate scratch tables while the frame is BUILT, so the
  * dumped plan is the final returned frame's plan (the read-back shape); that
  * is the plan the bench times with .count() after the gate's side effects.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = if (args.length > 2) args(2) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val only = sys.env.get("SPARK_GRAFT_PLAN_ONLY").map(_.split(",").toSet)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .toSeq.sortBy(_._1)
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
          java.nio.file.Files.write(
            java.nio.file.Paths.get(outDir, s"$name$suffix.txt"),
            txt.getBytes("UTF-8"))
          println(s"[plandump] wrote $name$suffix.txt")
        } catch {
          case NonFatal(e) => println(s"[plandump] $name FAILED: $e")
        }
      }
    spark.stop()
  }
}
