package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

import graft.SparkSpec

class RestartSpec extends SparkSpec {
  import spark.implicits._

  test("restart loop retries failed query starts with backoff, then runs") {
    implicit val sqlCtx = spark.sqlContext
    var calls = 0
    val mk: () => StreamingQuery = () => {
      calls += 1
      if (calls < 3) throw new RuntimeException("connection refused")
      val src = MemoryStream[String]
      val q = src.toDF().writeStream.format("memory")
        .queryName(s"restart_ok").start()
      src.addData("x")
      // stop from a helper thread once data is processed → clean termination
      new Thread(() => { q.processAllAvailable(); q.stop() }).start()
      q
    }
    val attempts = Restart.runWithRestart(mk, backoffSeconds = 0, maxRestarts = 5)
    assert(attempts === 3)
    assert(spark.table("restart_ok").count() === 1)
  }

  test("restart loop rethrows once maxRestarts is exhausted") {
    intercept[RuntimeException] {
      Restart.runWithRestart(
        () => throw new RuntimeException("permanent failure"),
        backoffSeconds = 0, maxRestarts = 2)
    }
  }
}
