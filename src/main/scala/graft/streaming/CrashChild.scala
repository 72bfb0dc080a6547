package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

import graft.GraftConfig

/** Child JVM for the crash-kill e2e (CrashKillSpec): runs the
  * [[WikiStream.startExactlyOnce]] pipeline with the late-data
  * dead-letter split so the PARENT test can SIGKILL this process
  * mid-epoch — real process death, not a simulated replay — and then
  * relaunch it in `finish` mode to drain the source from the same
  * checkpoint. One file per trigger keeps the epoch sequence
  * deterministic across the kill.
  *
  * args: srcDir sinkDir lateDir checkpointDir mode(run|finish)
  * [catalogDir] — the optional 6th arg adds the per-epoch cross-table
  * catalog publish, so the parent can kill INSIDE the
  * commit-late/commit-main/publish-catalog window too. */
object CrashChild {
  def main(args: Array[String]): Unit = {
    val Array(srcDir, sinkDir, lateDir, ckpt, mode) = args.take(5)
    val catalogDir = if (args.length > 5) args(5) else null
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val trigger =
      if (mode == "finish") Some(Trigger.AvailableNow())
      else Some(Trigger.ProcessingTime("50 milliseconds"))
    val q = WikiStream.startExactlyOnce(spark, srcDir, sinkDir, ckpt,
      GraftConfig(dbMaxEvents = 100000), trigger = trigger,
      lateDir = lateDir, maxFilesPerTrigger = 1, catalogDir = catalogDir)
    q.awaitTermination() // run mode: until SIGKILLed; finish: until drained
    spark.stop()
  }
}
