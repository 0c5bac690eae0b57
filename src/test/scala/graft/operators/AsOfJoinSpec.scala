package graft.operators

import java.sql.Timestamp

import graft.GraftTestBase

class AsOfJoinSpec extends GraftTestBase {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join picks latest right row <= left time, per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3"))
      .toDF("user_id", "t", "pid")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 11:59:00"), 101L),
      (1L, ts("2024-01-01 12:00:00"), 102L), // equal ts: inclusive match
      (2L, ts("2024-01-01 09:30:00"), 200L)) // after p3: no match
      .toDF("user_id", "t", "rid")

    val out = AsOfJoin.backward(left, right, Seq("user_id"), "t", "t", Seq("rid"))
      .collect().map(r => r.getAs[String]("pid") -> Option(r.getAs[java.lang.Long]("asof_rid"))).toMap

    assert(out("p1").contains(100L))
    assert(out("p2").contains(102L)) // <= semantics: equal timestamp wins over 11:59
    assert(out("p3").isEmpty)        // left-outer: unmatched left survives with null
  }

  test("null payload fields stay with their own row (no cross-row mixing)") {
    // right row at 11:00 has a NULL v; a per-column fill would carry v
    // from the 09:00 row while rid comes from 11:00 — the struct fill
    // must keep both fields from the 11:00 row.
    val left = Seq((1L, ts("2024-01-01 12:00:00"), "p"))
      .toDF("user_id", "t", "pid")
    val right = Seq(
      (1L, ts("2024-01-01 09:00:00"), java.lang.Long.valueOf(1L), java.lang.Double.valueOf(9.9)),
      (1L, ts("2024-01-01 11:00:00"), java.lang.Long.valueOf(2L), null.asInstanceOf[java.lang.Double]))
      .toDF("user_id", "t", "rid", "v")

    val r = AsOfJoin.backward(left, right, Seq("user_id"), "t", "t", Seq("rid", "v"))
      .collect().head
    assert(r.getAs[java.lang.Long]("asof_rid") == 2L)
    assert(r.isNullAt(r.fieldIndex("asof_v")), "null v must NOT be backfilled from the 09:00 row")
  }

  test("as-of query q34 matches per-row recompute on sf0.001") {
    val rows = graft.queries.Events.queries("q34_asof_join")(spark, sf001).collect()
    val ev = graft.Tables(spark, sf001)("events")
      .select("event_id", "user_id", "event_type", "ts").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getTimestamp(3)))
    val clicks = ev.filter(_._3 == "click")
    rows.foreach { r =>
      val user = r.getLong(0); val pid = r.getLong(1)
      val pTs  = ev.find(e => e._1 == pid).get._4
      val expect = clicks.filter(c => c._2 == user && !c._4.after(pTs))
        .sortBy(_._4.getTime).lastOption.map(_._1)
      assert(Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong) == expect,
        s"purchase $pid")
    }
  }
}
