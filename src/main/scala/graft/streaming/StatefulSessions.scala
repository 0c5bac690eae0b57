package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming: gap-based sessionization with
  * `flatMapGroupsWithState` — the arbitrary-state path the batch
  * Sessionize operator (lag + running sum) can't express incrementally.
  *
  * State per user is one open session (start/last/n/sum). A new event
  * either extends it or closes it (gap exceeded → the closed session is
  * EMITTED and a fresh one opens). Idle sessions close via EVENT-TIME
  * timeout: when the watermark passes last-event + gap, the timeout
  * callback flushes the session — so state is bounded by the number of
  * concurrently-active users, never by history. Append output mode +
  * watermark make this the production shape for infinite streams (the
  * batch twin, q33, is the finite-data oracle).
  */
object StatefulSessions extends Serializable {

  final case class Ev(user_id: Long, ts: Timestamp, value: Double)

  final case class OpenSession(startMs: Long, lastMs: Long, n: Int, sum: Double)

  final case class SessionOut(
      user_id: Long, session_start: Timestamp, n_events: Int,
      sum_value: Double, duration_s: Double)

  private def close(userId: Long, s: OpenSession): SessionOut =
    SessionOut(userId, new Timestamp(s.startMs), s.n, s.sum,
               (s.lastMs - s.startMs) / 1000.0)

  /** Pure per-group transition: fold one micro-batch of events into the
    * open-session state. Returns (new open state, sessions closed by
    * this batch). Split out of the streaming wiring so the out-of-order
    * policies are unit-testable without a stream:
    *   - late-but-in-gap events (above watermark, earlier than the open
    *     session's start) extend the session BACKWARD — startMs clamps
    *     with min() so session_start/duration stay correct;
    *   - stragglers older than the open session by more than the gap
    *     belong to earlier, already-flushed sessions — they are
    *     gap-sessionized among themselves and emitted closed rather
    *     than silently folded into (and corrupting) the open session.
    *     (With watermark delay == gap this path is reachable only in
    *     the one-batch watermark lag window; it is the safety net for
    *     that window.)
    */
  private[streaming] def processEvents(
      userId: Long, evs: Seq[Ev], openState: Option[OpenSession],
      gapMs: Long): (Option[OpenSession], Seq[SessionOut]) = {
    val sorted = evs.sortBy(_.ts.getTime)
    val closedSessions = Seq.newBuilder[SessionOut]

    // Stragglers older than the open session by more than the gap belong
    // to earlier, already-flushed sessions. Gap-sessionize them among
    // THEMSELVES (two in-gap stragglers form one session, matching the
    // batch twin's semantics) and emit everything closed — their last
    // session is by construction > gap away from the open session's
    // start, so it can never merge forward.
    val (stragglers, current) = openState match {
      case Some(s) => sorted.partition(_.ts.getTime < s.startMs - gapMs)
      case None    => (Seq.empty[Ev], sorted)
    }
    if (stragglers.nonEmpty) {
      val (lastOld, oldClosed) = processEvents(userId, stragglers, None, gapMs)
      closedSessions ++= oldClosed
      lastOld.foreach(s => closedSessions += close(userId, s))
    }

    var open = openState
    current.foreach { e =>
      val t = e.ts.getTime
      open match {
        // Late-but-in-gap events extend the session BACKWARD: clamp
        // startMs so session_start/duration stay correct.
        case Some(s) if t >= s.startMs - gapMs && t - s.lastMs <= gapMs =>
          open = Some(s.copy(startMs = math.min(s.startMs, t),
                             lastMs = math.max(s.lastMs, t), n = s.n + 1,
                             sum = s.sum + e.value))
        case Some(s) =>
          closedSessions += close(userId, s)
          open = Some(OpenSession(t, t, 1, e.value))
        case None =>
          open = Some(OpenSession(t, t, 1, e.value))
      }
    }
    (open, closedSessions.result())
  }

  def sessionize(events: Dataset[Ev], gapSeconds: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSeconds * 1000L

    def fn(userId: Long, evs: Iterator[Ev],
           state: GroupState[OpenSession]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(close(userId, _)).iterator
        state.remove()
        return out
      }
      val (open, closedSessions) =
        processEvents(userId, evs.toSeq, state.getOption, gapMs)
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.lastMs + gapMs)
      }
      closedSessions.iterator
    }

    events
      .withWatermark("ts", s"$gapSeconds seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }
}
