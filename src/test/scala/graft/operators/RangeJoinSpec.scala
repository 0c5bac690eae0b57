package graft.operators

import java.sql.Timestamp

import graft.GraftTestBase

class RangeJoinSpec extends GraftTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("point-in-interval: inclusive start, exclusive end, bucket-boundary spans") {
    val points = Seq(
      (1L, 10L, ts("2024-01-01 10:00:00")), // == start: in
      (1L, 11L, ts("2024-01-01 10:59:59")), // inside, next bucket: in
      (1L, 12L, ts("2024-01-01 11:00:00")), // == end: out
      (1L, 13L, ts("2024-01-01 09:59:59")), // before: out
      (2L, 20L, ts("2024-01-01 10:30:00"))) // wrong key: out
      .toDF("k", "pid", "t")
    val intervals = Seq((1L, 100L, ts("2024-01-01 10:00:00"), ts("2024-01-01 11:00:00")))
      .toDF("ik", "iid", "start", "end")

    val got = RangeJoin.pointInInterval(points, "k", "t",
        intervals, "ik", "start", "end", bucketWidthSec = 3600)
      .select("pid").collect().map(_.getLong(0)).toSet
    assert(got == Set(10L, 11L))
  }

  test("bucketed range join equals naive non-equi join on real events") {
    val ev = graft.Tables(spark, sf001)("events")
    import org.apache.spark.sql.functions._
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("sid"), col("ts").as("s_ts"),
              (col("ts") + expr("INTERVAL 1 HOUR")).as("s_end"))
    val points = ev.select(col("user_id").as("pu"), col("event_id").as("pid"),
                           col("ts").as("p_ts"))
    val bucketed = RangeJoin.pointInInterval(points, "pu", "p_ts",
        signups, "user_id", "s_ts", "s_end", bucketWidthSec = 3600)
      .select("sid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val naive = points.join(signups,
        col("pu") === col("user_id") &&
        col("p_ts") >= col("s_ts") && col("p_ts") < col("s_end"))
      .select("sid", "pid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(bucketed == naive && bucketed.nonEmpty)
  }
}
