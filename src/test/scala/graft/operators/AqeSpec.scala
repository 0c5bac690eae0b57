package graft.operators

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Adaptive Query Execution behaviors the engine RELIES on at scale
  * (rather than hand-rolling): runtime skew-join splitting and
  * post-shuffle partition coalescing. These specs pin that the local
  * configuration actually triggers both, so the "AQE handles it"
  * claims in SCALE.md stay tested instead of aspirational. */
class AqeSpec extends GraftTestBase {
  import spark.implicits._

  /** All nodes of the FINAL adaptive plan, descending into query
    * stages (collect() alone stops at stage boundaries). */
  private def finalNodes(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec        => p +: flatten(q.plan)
      case _                        => p +: p.children.flatMap(flatten)
    }
    flatten(df.queryExecution.executedPlan)
  }

  test("AQE splits a skewed sort-merge join at runtime") {
    // key 0 carries 80% of all rows, so its post-shuffle partition is
    // >10x the median (the detector needs > 5x AND > the byte
    // threshold). Thresholds lowered so it fires at test scale —
    // production uses the defaults (256 MB) with the same machinery.
    val old = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.shuffle.partitions" -> "32")
      .map { case (k, v) => (k, spark.conf.getOption(k), v) }
    old.foreach { case (k, _, v) => spark.conf.set(k, v) }
    try {
      val skewed = spark.range(200000)
        .select(when(col("id") % 5 =!= 0, 0L).otherwise(col("id")).as("k"),
                col("id").as("v"))
      val dim = spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val joined = skewed.join(dim, "k")
      val smj = finalNodes(joined).collect { case j: SortMergeJoinExec => j }
      assert(smj.nonEmpty, "expected a sort-merge join")
      assert(smj.exists(_.isSkewJoin), "AQE did not mark the join skew-handled")
      assert(joined.count() == skewed.join(dim.hint("shuffle_hash"), "k").count())
    } finally old.foreach {
      case (k, Some(v), _) => spark.conf.set(k, v)
      case (k, None, _)    => spark.conf.unset(k)
    }
  }

  test("AQE coalesces tiny post-shuffle partitions") {
    // 32 shuffle partitions configured, but the data is a few KB —
    // the read side must collapse to far fewer partitions.
    val agg = spark.range(1000)
      .select(pmod(col("id"), lit(7)).as("k"))
      .groupBy("k").count()
    val reads = finalNodes(agg).collect { case r: AQEShuffleReadExec => r }
    assert(reads.nonEmpty, "no AQE shuffle read in the plan")
    assert(reads.head.partitionSpecs.size <
      spark.conf.get("spark.sql.shuffle.partitions").toInt,
      s"expected coalesced partitions, got ${reads.head.partitionSpecs.size}")
  }
}
