package graft.streaming

import org.apache.spark.sql.streaming.StreamingQuery

/** S5 auto-reconnect (pipeline.py:28,53-58): the reference wraps its stream
  * loop in `while True` with a 5 s sleep on connection errors. Spark
  * already retries tasks/micro-batches internally; this is the
  * query-level restart loop for source-level failures (the SSE connection
  * dying), with the same fixed backoff.
  */
object Restart {

  /** Run `mkQuery` until it terminates cleanly; on failure, back off and
    * restart (checkpointing makes the restart resume, S2/S3). Returns the
    * number of attempts made. `maxRestarts` bounds runaway loops. */
  def runWithRestart(mkQuery: () => StreamingQuery,
      backoffSeconds: Int = 5, maxRestarts: Int = Int.MaxValue): Int = {
    var attempts = 0
    var done = false
    while (!done) {
      attempts += 1
      try {
        val q = mkQuery()
        q.awaitTermination()
        done = true // clean stop
      } catch {
        case e: Exception if attempts <= maxRestarts =>
          Thread.sleep(backoffSeconds * 1000L)
        case e: Exception => throw e
      }
    }
    attempts
  }
}
