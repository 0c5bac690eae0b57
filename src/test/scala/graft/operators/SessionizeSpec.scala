package graft.operators

import java.sql.Timestamp

import graft.GraftTestBase

class SessionizeSpec extends GraftTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gap splits sessions; boundary gap equal to threshold stays in-session") {
    val df = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00")),
      (1L, 2L, ts("2024-01-01 10:29:00")), // 29 min: same session
      (1L, 3L, ts("2024-01-01 10:59:00")), // exactly 30 min: same (gap > not >=)
      (1L, 4L, ts("2024-01-01 11:29:01")), // 30m01s: new session
      (2L, 5L, ts("2024-01-01 10:00:00"))) // other user: own session
      .toDF("user_id", "event_id", "ts")
    val got = Sessionize.sessionize(df, "user_id", "ts", "event_id", 1800)
      .collect().map(r => r.getAs[Long]("event_id") -> r.getAs[Long]("session_id")).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 2L, 5L -> 1L))
  }
}
