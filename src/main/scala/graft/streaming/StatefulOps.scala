package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom per-key streaming state via mapGroupsWithState — the escape hatch
  * for semantics the built-in stateful operators can't express
  * (SURVEY.md §2.10 streaming row; the reference's nearest analog is its
  * per-run `rows_added_to_db` counter, A8, generalized here to per-key).
  *
  * State is per-key and bounded by the timeout — the 100 TB property:
  * state size tracks live keys, not history.
  */
object StatefulOps {

  final case class UserEvent(user_id: Long, ts: Timestamp, event_type: String)

  /** Running per-user stats carried across micro-batches. */
  final case class UserStats(user_id: Long, n_events: Long,
      first_seen: Timestamp, last_seen: Timestamp)

  def updateUserStats(expireIdleAfter: Option[String])(
      userId: Long, events: Iterator[UserEvent],
      state: GroupState[UserStats]): UserStats = {
    if (state.hasTimedOut) {
      // idle key expired: emit the final stats once and drop the state —
      // without this, the state would be resurrected and re-armed forever
      val last = state.get
      state.remove()
      return last
    }
    val batch = events.toSeq
    val prev = state.getOption
    val all = prev.map(p => (p.n_events, p.first_seen, p.last_seen))
      .getOrElse((0L, batch.head.ts, batch.head.ts))
    val nexts = batch.map(_.ts)
    val updated = UserStats(
      userId,
      all._1 + batch.size,
      nexts.foldLeft(all._2)((a, b) => if (b.before(a)) b else a),
      nexts.foldLeft(all._3)((a, b) => if (b.after(a)) b else a))
    state.update(updated)
    // idle keys expire: state stays proportional to active users. (Timeout
    // processing makes the query schedule batches even with no input, so
    // it is opt-in — long-running deployments want it on.)
    expireIdleAfter.foreach(state.setTimeoutDuration)
    updated
  }

  /** Streaming: running per-user counters via custom state. Each
    * micro-batch emits the refreshed stats row for every key it touched
    * (update-mode output). */
  def runningUserStats(events: Dataset[UserEvent],
      expireIdleAfter: Option[String] = None): Dataset[UserStats] = {
    implicit val enc = Encoders.product[UserStats]
    val timeout =
      if (expireIdleAfter.isDefined) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .mapGroupsWithState[UserStats, UserStats](timeout)(
        updateUserStats(expireIdleAfter))
  }

  val outputMode: OutputMode = OutputMode.Update()

  // ------------------------------------------------- custom sessionizer
  /** A closed session: emitted only once its gap has elapsed (event-time,
    * driven by the keyed event stream itself). */
  final case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** In-flight session state (public: Catalyst codegen instantiates it). */
  final case class OpenSession(start: Timestamp, last: Timestamp, n: Long)

  /** Custom-state sessionization via flatMapGroupsWithState (Append):
    * unlike the built-in session_window aggregate, this emits each session
    * exactly once when a later event closes it — the shape used when the
    * session payload is richer than an aggregate (e.g. carrying per-session
    * sampled events). gapMillis compares event times within the key. */
  def sessionize(events: Dataset[UserEvent],
      gapMillis: Long): Dataset[Session] = {
    implicit val enc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[OpenSession]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, batch, state: GroupState[OpenSession]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var open = state.getOption
          val closed = Seq.newBuilder[Session]
          sorted.foreach { e =>
            open match {
              case Some(o) if e.ts.getTime - o.last.getTime < gapMillis =>
                open = Some(OpenSession(o.start, e.ts, o.n + 1))
              case Some(o) =>
                closed += Session(userId, o.start, o.last, o.n)
                open = Some(OpenSession(e.ts, e.ts, 1))
              case None =>
                open = Some(OpenSession(e.ts, e.ts, 1))
            }
          }
          open.foreach(state.update)
          closed.result().iterator
      }
  }

  // --------------------------------------------------- burst alerting
  /** A fired burst alert: `n_events` CONSECUTIVE `event_type` events
    * (no other type, no gap over the limit, batch boundaries
    * irrelevant) — the streaming twin of the batch q138 island
    * detector. Emitted exactly once per run, the moment the run first
    * reaches the threshold (append semantics: an alert never retracts
    * or re-fires as the same run grows). */
  final case class BurstAlert(user_id: Long, event_type: String,
      first_ms: Long, last_ms: Long, n_events: Long)

  /** In-flight run state (public: Catalyst codegen instantiates it). */
  final case class OpenRun(event_type: String, firstMs: Long,
      lastMs: Long, n: Long, alerted: Boolean)

  /** Live "three failures in a row" detection via
    * flatMapGroupsWithState: per user, a run of consecutive
    * `watchType` events — broken by ANY other event type or an
    * event-time gap over `gapMillis` — fires one alert when its length
    * first reaches `threshold`. Runs carry across micro-batches (two
    * errors in batch N and one in batch N+1 alert in batch N+1); a
    * break resets silently. State is ONE small run record per live
    * user whatever the history (the bounded-state contract of every
    * stateful op here). */
  def burstAlerts(events: Dataset[UserEvent], watchType: String,
      threshold: Int, gapMillis: Long): Dataset[BurstAlert] = {
    implicit val enc = Encoders.product[BurstAlert]
    implicit val stateEnc = Encoders.product[OpenRun]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[OpenRun, BurstAlert](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId, batch, state: GroupState[OpenRun]) =>
          val sorted = batch.toSeq.sortBy(_.ts.getTime)
          var open = state.getOption
          val fired = Seq.newBuilder[BurstAlert]
          sorted.foreach { e =>
            val ms = e.ts.getTime
            open = open match {
              case Some(r) if r.event_type == e.event_type &&
                  ms - r.lastMs <= gapMillis =>
                Some(OpenRun(r.event_type, r.firstMs, ms, r.n + 1,
                  r.alerted))
              case _ =>
                Some(OpenRun(e.event_type, ms, ms, 1L, alerted = false))
            }
            open = open.map { r =>
              if (r.event_type == watchType && !r.alerted &&
                  r.n >= threshold) {
                fired += BurstAlert(userId, r.event_type, r.firstMs,
                  r.lastMs, r.n)
                r.copy(alerted = true)
              } else r
            }
          }
          open.foreach(state.update)
          fired.result().iterator
      }
  }
}
