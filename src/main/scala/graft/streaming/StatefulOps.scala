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
}
