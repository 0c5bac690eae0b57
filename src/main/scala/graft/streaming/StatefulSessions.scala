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
    * this batch). Split out of the streaming wiring so out-of-order
    * handling is unit-testable without a stream.
    *
    * Algorithm — exactly batch gap-sessionization over interval
    * summaries: (1) gap-chain the incoming (sorted) events among
    * themselves; (2) sweep-merge those chains together with the open
    * session's own interval on the time axis, clamping start/end as
    * intervals coalesce. Late in-gap events therefore extend the open
    * session BACKWARD (start clamps), stragglers older than the gap
    * close as their own sessions, and a late chain that bridges a
    * straggler to within the gap of the open session merges the whole
    * chain — the case a per-event fold against a fixed session start
    * gets wrong. Everything but the latest merged interval is emitted
    * closed; the latest stays open. (With watermark delay == gap the
    * out-of-order paths are reachable only in the one-batch watermark
    * lag window; they are the safety net for that window.)
    */
  private[streaming] def processEvents(
      userId: Long, evs: Seq[Ev], openState: Option[OpenSession],
      gapMs: Long): (Option[OpenSession], Seq[SessionOut]) = {
    val sorted = evs.sortBy(_.ts.getTime)

    // (1) gap-chains over the incoming events
    val chains = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
    sorted.foreach { e =>
      val t = e.ts.getTime
      chains.lastOption match {
        case Some(c) if t - c.lastMs <= gapMs =>
          chains(chains.length - 1) = c.copy(
            lastMs = math.max(c.lastMs, t), n = c.n + 1, sum = c.sum + e.value)
        case _ =>
          chains += OpenSession(t, t, 1, e.value)
      }
    }

    // (2) sweep-merge chains + the open session's interval summary
    val merged = scala.collection.mutable.ArrayBuffer.empty[OpenSession]
    (chains ++ openState).sortBy(_.startMs).foreach { c =>
      merged.lastOption match {
        case Some(m) if c.startMs - m.lastMs <= gapMs =>
          merged(merged.length - 1) = OpenSession(
            math.min(m.startMs, c.startMs), math.max(m.lastMs, c.lastMs),
            m.n + c.n, m.sum + c.sum)
        case _ =>
          merged += c
      }
    }

    if (merged.isEmpty) (None, Seq.empty)
    else (Some(merged.last), merged.init.toSeq.map(close(userId, _)))
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
