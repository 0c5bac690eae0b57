package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.GraftTestBase
import graft.streaming.StatefulSessions.Ev

/** Drives the stateful sessionizer through a real multi-micro-batch
  * stream (MemoryStream), checking gap-close, cross-batch state carry,
  * and event-time-timeout flush. */
class StatefulSessionsSpec extends GraftTestBase {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("sessions close on gap, carry state across batches, flush on watermark timeout") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = StatefulSessions.sessionize(input.toDS(), gapSeconds = 1800)
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("stateful_sessions")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // batch 1: user 1 opens a session (2 events, 10 min apart)
    input.addData(Ev(1L, ts(0), 1.0), Ev(1L, ts(10), 2.0))
    q.processAllAvailable()
    assert(spark.table("stateful_sessions").count() == 0) // still open

    // batch 2: event 2h later — gap exceeded, session 1 closes, new opens
    input.addData(Ev(1L, ts(130), 5.0))
    q.processAllAvailable()
    val afterClose = spark.table("stateful_sessions").as[StatefulSessions.SessionOut].collect()
    assert(afterClose.length == 1)
    assert(afterClose.head.n_events == 2 && afterClose.head.sum_value == 3.0
      && afterClose.head.duration_s == 600.0)

    // batch 3: far-future event from ANOTHER user pushes the watermark
    // past session 2's timeout: the idle session flushes via timeout
    input.addData(Ev(2L, ts(600), 9.0))
    q.processAllAvailable()
    input.addData(Ev(2L, ts(601), 1.0)) // one more batch so timeout fires
    q.processAllAvailable()
    val all = spark.table("stateful_sessions").as[StatefulSessions.SessionOut].collect()
    q.stop()
    val user1Sessions = all.filter(_.user_id == 1L).sortBy(_.session_start.getTime)
    assert(user1Sessions.length == 2)
    assert(user1Sessions(1).n_events == 1 && user1Sessions(1).sum_value == 5.0)
  }

  test("late in-gap event extends the session backward (start/duration clamp)") {
    implicit val sc = spark.sqlContext
    val input = MemoryStream[Ev]
    val sessions = StatefulSessions.sessionize(input.toDS(), gapSeconds = 1800)
    val q = sessions.writeStream
      .outputMode("append").format("memory").queryName("stateful_late")
      .trigger(Trigger.ProcessingTime(0))
      .start()

    // batch 1 opens a session at t=60min
    input.addData(Ev(1L, ts(60), 1.0))
    q.processAllAvailable()
    // batch 2 delivers an EARLIER event (t=50min, within gap, above
    // watermark): session must now start at 50 and span 10 minutes
    input.addData(Ev(1L, ts(50), 2.0))
    q.processAllAvailable()
    // close it via gap
    input.addData(Ev(1L, ts(300), 9.0))
    q.processAllAvailable()
    val done = spark.table("stateful_late").as[StatefulSessions.SessionOut].collect()
    q.stop()
    assert(done.length == 1)
    val s = done.head
    assert(s.session_start == ts(50), s"start must clamp to the late event, got ${s.session_start}")
    assert(s.n_events == 2 && s.sum_value == 3.0 && s.duration_s == 600.0)
  }

  test("processEvents: straggler older than start-gap never corrupts the open session") {
    // Direct unit test: with watermark delay == gap this input reaches
    // the state function only inside the one-batch watermark lag window,
    // so the policy is pinned here rather than through a stream.
    val gapMs = 1800 * 1000L
    val open = Some(StatefulSessions.OpenSession(
      startMs = ts(600).getTime, lastMs = ts(610).getTime, n = 2, sum = 3.0))
    val (after, closed) = StatefulSessions.processEvents(
      1L, Seq(Ev(1L, ts(300), 7.0)), open, gapMs)
    assert(closed.length == 1, "straggler must be emitted, not merged")
    assert(closed.head.n_events == 1 && closed.head.sum_value == 7.0
      && closed.head.session_start == ts(300))
    assert(after == open, "open session must be untouched by the straggler")
  }

  test("processEvents: multiple in-gap stragglers sessionize together, not one-by-one") {
    // Two stragglers 10 min apart (inside the gap) must form ONE
    // two-event session — matching batch gap-sessionization — and a
    // third straggler past the gap from them forms its own.
    val gapMs = 1800 * 1000L
    val open = Some(StatefulSessions.OpenSession(
      startMs = ts(600).getTime, lastMs = ts(610).getTime, n = 2, sum = 3.0))
    val (after, closed) = StatefulSessions.processEvents(
      1L, Seq(Ev(1L, ts(300), 7.0), Ev(1L, ts(310), 2.0), Ev(1L, ts(60), 5.0)),
      open, gapMs)
    assert(after == open, "open session must be untouched")
    val bySum = closed.map(s => s.sum_value -> s).toMap
    assert(closed.length == 2, s"got $closed")
    assert(bySum(5.0).n_events == 1 && bySum(5.0).session_start == ts(60))
    assert(bySum(9.0).n_events == 2 && bySum(9.0).session_start == ts(300)
      && bySum(9.0).duration_s == 600.0)
  }

  test("processEvents: a bridging late event merges an otherwise-too-old straggler") {
    // gap=30min; open session starts at t=600. e1 at 560 is > gap from
    // 600 alone, but e2 at 580 chains e1 within the gap AND reaches the
    // session — batch sessionization makes this ONE session starting at
    // 560, and the interval sweep must agree.
    val gapMs = 1800 * 1000L
    val open = Some(StatefulSessions.OpenSession(
      startMs = ts(600).getTime, lastMs = ts(610).getTime, n = 2, sum = 3.0))
    val (after, closed) = StatefulSessions.processEvents(
      1L, Seq(Ev(1L, ts(560), 4.0), Ev(1L, ts(580), 5.0)), open, gapMs)
    assert(closed.isEmpty, s"nothing should close, got $closed")
    assert(after.get.startMs == ts(560).getTime && after.get.lastMs == ts(610).getTime)
    assert(after.get.n == 4 && after.get.sum == 12.0)
  }

  test("processEvents: late in-gap event clamps startMs backward") {
    val gapMs = 1800 * 1000L
    val open = Some(StatefulSessions.OpenSession(
      startMs = ts(60).getTime, lastMs = ts(60).getTime, n = 1, sum = 1.0))
    val (after, closed) = StatefulSessions.processEvents(
      1L, Seq(Ev(1L, ts(50), 2.0)), open, gapMs)
    assert(closed.isEmpty)
    assert(after.get.startMs == ts(50).getTime && after.get.lastMs == ts(60).getTime)
    assert(after.get.n == 2 && after.get.sum == 3.0)
  }
}
