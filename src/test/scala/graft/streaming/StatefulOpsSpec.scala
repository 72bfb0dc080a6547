package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec
import graft.streaming.StatefulOps.UserEvent

class StatefulOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("timed-out key emits final stats once and removes its state") {
    import org.apache.spark.sql.streaming.TestGroupState
    val existing = StatefulOps.UserStats(7L, 5L,
      ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00"))
    val state = TestGroupState.create[StatefulOps.UserStats](
      optionalState = org.apache.spark.api.java.Optional.of(existing),
      timeoutConf = org.apache.spark.sql.streaming.GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 1000L,
      eventTimeWatermarkMs = org.apache.spark.api.java.Optional.empty[Long](),
      hasTimedOut = true)
    val out = StatefulOps.updateUserStats(Some("1 hour"))(
      7L, Iterator.empty, state)
    assert(out === existing) // final emission
    assert(state.isRemoved) // state dropped, not resurrected
  }

  test("flatMapGroupsWithState sessionizer emits sessions when closed") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[UserEvent]
    val out = StatefulOps.sessionize(src.toDS(), gapMillis = 30 * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      src.addData(
        UserEvent(1L, ts("2024-01-01 10:00:00"), "view"),
        UserEvent(1L, ts("2024-01-01 10:10:00"), "click"))
      q.processAllAvailable()
      assert(spark.table("sessions").count() === 0) // session still open
      src.addData(UserEvent(1L, ts("2024-01-01 12:00:00"), "view")) // closes it
      q.processAllAvailable()
      val sessions = spark.table("sessions").collect()
      assert(sessions.length === 1)
      assert(sessions.head.getAs[Long]("n_events") === 2L)
      assert(sessions.head.getAs[Timestamp]("session_start") === ts("2024-01-01 10:00:00"))
      assert(sessions.head.getAs[Timestamp]("session_end") === ts("2024-01-01 10:10:00"))
    } finally q.stop()
  }

  test("mapGroupsWithState carries per-user counters across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[UserEvent]
    val out = StatefulOps.runningUserStats(src.toDS())
    val q = out.writeStream.format("memory").queryName("user_stats")
      .outputMode(StatefulOps.outputMode).start()
    try {
      src.addData(
        UserEvent(1L, ts("2024-01-01 10:00:00"), "view"),
        UserEvent(1L, ts("2024-01-01 10:05:00"), "click"),
        UserEvent(2L, ts("2024-01-01 10:01:00"), "view"))
      q.processAllAvailable()
      src.addData(UserEvent(1L, ts("2024-01-01 10:30:00"), "purchase"))
      q.processAllAvailable()
      // memory sink in update mode appends refreshed rows; latest per key wins
      val latest = spark.table("user_stats")
        .orderBy($"last_seen")
        .collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
        .toMap
      assert(latest(1L)._1 === 3L) // state carried: 2 + 1
      assert(latest(1L)._2 === ts("2024-01-01 10:00:00"))
      assert(latest(1L)._3 === ts("2024-01-01 10:30:00"))
      assert(latest(2L)._1 === 1L)
    } finally q.stop()
  }

  test("burst alerts fire once per cross-batch run, reset on type or " +
      "gap breaks, and never re-fire as the run grows") {
    implicit val sqlCtx = spark.sqlContext
    val src = MemoryStream[UserEvent]
    val out = StatefulOps.burstAlerts(src.toDS(), watchType = "error",
      threshold = 3, gapMillis = 10 * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("bursts")
      .outputMode("append").start()
    try {
      // two errors in batch 1: run open, below threshold — no alert yet
      src.addData(
        UserEvent(1L, ts("2024-01-01 10:00:00"), "error"),
        UserEvent(1L, ts("2024-01-01 10:01:00"), "error"),
        // user 2's run is broken by a click between errors
        UserEvent(2L, ts("2024-01-01 10:00:00"), "error"),
        UserEvent(2L, ts("2024-01-01 10:01:00"), "click"),
        UserEvent(2L, ts("2024-01-01 10:02:00"), "error"))
      q.processAllAvailable()
      assert(spark.table("bursts").count() === 0)
      // the third consecutive error arrives in batch 2: alert fires,
      // with the run's TRUE start (batch boundaries invisible)
      src.addData(UserEvent(1L, ts("2024-01-01 10:02:00"), "error"))
      q.processAllAvailable()
      val a = spark.table("bursts").collect()
      assert(a.length === 1)
      assert(a.head.getAs[Long]("user_id") === 1L)
      assert(a.head.getAs[Long]("n_events") === 3L)
      assert(a.head.getAs[Long]("first_ms") ===
        ts("2024-01-01 10:00:00").getTime)
      // the same run growing longer does NOT re-alert
      src.addData(UserEvent(1L, ts("2024-01-01 10:03:00"), "error"))
      q.processAllAvailable()
      assert(spark.table("bursts").count() === 1)
      // a >10 min gap resets: three more errors = a NEW run, new alert
      src.addData(
        UserEvent(1L, ts("2024-01-01 11:00:00"), "error"),
        UserEvent(1L, ts("2024-01-01 11:01:00"), "error"),
        UserEvent(1L, ts("2024-01-01 11:02:00"), "error"))
      q.processAllAvailable()
      assert(spark.table("bursts").count() === 2)
      // a non-watched type bursting never alerts
      src.addData(
        UserEvent(3L, ts("2024-01-01 10:00:00"), "view"),
        UserEvent(3L, ts("2024-01-01 10:01:00"), "view"),
        UserEvent(3L, ts("2024-01-01 10:02:00"), "view"))
      q.processAllAvailable()
      assert(spark.table("bursts").count() === 2)
    } finally q.stop()
  }
}
