package graft.plans

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._

import graft.GraftTestBase
import graft.operators.AsOfJoin

class AsOfJoinPlanSpec extends GraftTestBase {
  import spark.implicits._

  private def left = Seq(
    (1L, 10L, "p1"), (1L, 20L, "p2"), (1L, 5L, "p0"),
    (2L, 7L, "p3"), (3L, 100L, "p4"))
    .toDF("k", "t", "lpay")
  private def right = Seq(
    (1L, 10L, "c10", 1.0), (1L, 15L, "c15", 2.0), (1L, 3L, "c3", 3.0),
    (2L, 8L, "c8", 4.0), (4L, 1L, "c1", 5.0))
    .toDF("k", "t", "rpay", "rv")

  test("latest prior-or-equal match per key, nulls when none") {
    val out = AsOfJoinPlan.backward(left, right, Seq("k"), "t", "t",
        Seq("rpay", "rv"))
      .select("k", "t", "lpay", "asof_rpay", "asof_rv")
      .orderBy("k", "t").collect().map(_.toSeq)
    assert(out.toSeq == Seq(
      Seq(1L, 5L, "p0", "c3", 3.0),    // 3 <= 5 < 10
      Seq(1L, 10L, "p1", "c10", 1.0),  // inclusive match at equal ts
      Seq(1L, 20L, "p2", "c15", 2.0),
      Seq(2L, 7L, "p3", null, null),   // right exists but only later (8 > 7)
      Seq(3L, 100L, "p4", null, null)) // key absent from right
    )
  }

  test("agrees with the window implementation on random data") {
    val r = new scala.util.Random(7)
    val l = (1 to 2000).map(i =>
      (r.nextInt(40).toLong, r.nextInt(10000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val rr = (1 to 3000).map(i =>
      (r.nextInt(45).toLong, r.nextInt(10000).toLong, i.toLong))
      .toDF("k", "t", "rid")
      // as-of picks the LATEST prior row; duplicate (k, t) right rows
      // make "latest" ambiguous between implementations — drop them
      .groupBy("k", "t").agg(max("rid").as("rid"))
    val native = AsOfJoinPlan.backward(l, rr, Seq("k"), "t", "t", Seq("rid"))
      .select("k", "t", "lid", "asof_rid")
    val window = AsOfJoin.backward(l, rr, Seq("k"), "t", "t", Seq("rid"))
      .select("k", "t", "lid", "asof_rid")
    assert(native.exceptAll(window).isEmpty && window.exceptAll(native).isEmpty)
    assert(native.count() == 2000)
  }

  test("plans a merge scan: no window operator, one exchange+sort per side") {
    // AQE off for a stable, un-staged plan tree to assert on.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = AsOfJoinPlan.backward(left, right, Seq("k"), "t", "t", Seq("rpay"))
      val nodes = df.queryExecution.executedPlan.collect { case p => p }
      assert(nodes.exists(_.isInstanceOf[AsOfJoinPlan.AsOfJoinExec]))
      assert(!nodes.exists(_.isInstanceOf[WindowExec]))
      assert(nodes.count(_.isInstanceOf[ShuffleExchangeExec]) == 2)
      assert(nodes.count(_.isInstanceOf[SortExec]) == 2)
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("empty right side yields all-null payloads, empty left yields nothing") {
    val emptyR = right.filter(lit(false))
    val a = AsOfJoinPlan.backward(left, emptyR, Seq("k"), "t", "t", Seq("rpay"))
    assert(a.count() == 5 && a.filter(col("asof_rpay").isNotNull).count() == 0)
    val emptyL = left.filter(lit(false))
    val b = AsOfJoinPlan.backward(emptyL, right, Seq("k"), "t", "t", Seq("rpay"))
    assert(b.count() == 0)
  }

  test("forward direction: earliest at-or-after match per key") {
    val out = AsOfJoinPlan.forward(left, right, Seq("k"), "t", "t",
        Seq("rpay", "rv"))
      .select("k", "t", "lpay", "asof_rpay", "asof_rv")
      .orderBy("k", "t").collect().map(_.toSeq)
    assert(out.toSeq == Seq(
      Seq(1L, 5L, "p0", "c10", 1.0),   // earliest >= 5 is 10
      Seq(1L, 10L, "p1", "c10", 1.0),  // inclusive at equal ts
      Seq(1L, 20L, "p2", null, null),  // nothing at/after 20
      Seq(2L, 7L, "p3", "c8", 4.0),
      Seq(3L, 100L, "p4", null, null))
    )
  }

  test("forward on random data == backward on negated times") {
    val r = new scala.util.Random(11)
    val l = (1 to 1500).map(i =>
      (r.nextInt(30).toLong, r.nextInt(5000).toLong, i.toLong))
      .toDF("k", "t", "lid")
    val rr = (1 to 2000).map(i =>
      (r.nextInt(35).toLong, r.nextInt(5000).toLong, i.toLong))
      .toDF("k", "t", "rid")
      .groupBy("k", "t").agg(max("rid").as("rid"))
    val fwd = AsOfJoinPlan.forward(l, rr, Seq("k"), "t", "t", Seq("rid"))
      .select("k", "t", "lid", "asof_rid")
    val viaNeg = AsOfJoinPlan.backward(
        l.withColumn("nt", -col("t")), rr.withColumn("nt", -col("t")),
        Seq("k"), "nt", "nt", Seq("rid"))
      .select("k", "t", "lid", "asof_rid")
    assert(fwd.exceptAll(viaNeg).isEmpty && viaNeg.exceptAll(fwd).isEmpty)
  }

  test("multi-column keys and same-source self as-of join resolve") {
    val e = left.withColumn("k2", col("k") % 2)
    val out = AsOfJoinPlan.backward(e, e, Seq("k", "k2"), "t", "t", Seq("lpay"))
    // every row matches at least itself (inclusive <=)
    assert(out.filter(col("asof_lpay").isNull).count() == 0)
  }
}
