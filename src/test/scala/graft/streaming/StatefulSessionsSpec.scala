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
}
