package graft.operators

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

import graft.GraftTestBase

class RecordLinkageSpec extends GraftTestBase {

  import spark.implicits._

  test("links each probe to its closest in-block match, deterministically") {
    val right = Seq("cold widget", "old widget", "blue widget", "red gear")
      .toDF("nm")
    val left = Seq("ld widget", "rred gear", "zzz zzz").toDF("probe")
    val got = RecordLinkage.linkBest(left, "probe", right, "nm")
      .select("probe", "nm", "dist").as[(String, String, Int)]
      .collect().sortBy(_._1)
    // 'ld widget': 'old widget' wins at dist 1 (vs 'cold widget' at 2);
    // the last-token blocker is leading-noise-robust by design, so a
    // TRAILING-word mutation would miss (documented trade-off)
    assert(got.toSeq == Seq(("ld widget", "old widget", 1),
      ("rred gear", "red gear", 1)))
    // 'zzz zzz' has no block partner -> absent, not null-matched
  }

  test("ties break by name order, not plan order") {
    val right = Seq("ba x", "bc x").toDF("nm") // both dist 1 from 'bb x'
    val left = Seq("bb x").toDF("probe")
    val got = RecordLinkage.linkBest(left, "probe", right, "nm")
      .select("nm").as[String].head()
    assert(got == "ba x")
  }

  test("blocking keeps the join equi-keyed (no cartesian product)") {
    val right = Seq("cold widget", "old widget").toDF("nm")
    val left = Seq("ld widget").toDF("probe")
    val plan = RecordLinkage.linkBest(left, "probe", right, "nm")
      .queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    val bad = plan.collect {
      case j: BroadcastNestedLoopJoinExec => j
      case j: CartesianProductExec        => j
    }
    assert(bad.isEmpty, "linkage must join on the block key")
  }
}
