package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

/** SQL join-strategy and partitioning hints — the explicit-control
  * surface for when the optimizer's cost call is wrong at scale (stale
  * stats, skewed builds): BROADCAST forces the dim build, MERGE forces
  * sort-merge, SHUFFLE_HASH forces hash build, REPARTITION/COALESCE
  * steer output partitioning. Each is plan-asserted, not just parsed. */
class JoinHintsSpec extends GraftTestBase {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec        => q +: flatten(q.plan)
    case other                    => other +: other.children.flatMap(flatten)
  }

  private def executedNodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect()
    flatten(df.queryExecution.executedPlan)
  }

  private def views(): Unit = Tables(spark, sf001).registerAll()

  test("BROADCAST hint forces a broadcast-hash join against the big side") {
    views()
    val saved = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // auto OFF
    try {
      val df = spark.sql("""
        SELECT /*+ BROADCAST(n) */ n.n_name, count(*) AS c
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name ORDER BY n.n_name""")
      assert(executedNodes(df).exists(_.isInstanceOf[BroadcastHashJoinExec]),
        "hint did not force broadcast with auto-broadcast disabled")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
      case None    => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("MERGE and SHUFFLE_HASH hints pick their physical joins") {
    views()
    val merge = spark.sql("""
      SELECT /*+ MERGE(o) */ count(*) AS c
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""")
    assert(executedNodes(merge).exists(_.isInstanceOf[SortMergeJoinExec]))

    val hash = spark.sql("""
      SELECT /*+ SHUFFLE_HASH(c) */ count(*) AS c
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey""")
    assert(executedNodes(hash).exists(_.isInstanceOf[ShuffledHashJoinExec]))
  }

  test("REPARTITION and COALESCE hints control output partitioning") {
    views()
    val rep = spark.sql(
      "SELECT /*+ REPARTITION(7, o_custkey) */ o_orderkey FROM orders")
    rep.collect()
    assert(flatten(rep.queryExecution.executedPlan)
      .exists(_.isInstanceOf[ShuffleExchangeLike]))
    assert(rep.rdd.getNumPartitions == 7)

    val co = spark.sql("SELECT /*+ COALESCE(1) */ o_orderkey FROM orders")
    assert(co.rdd.getNumPartitions == 1)
  }
}
