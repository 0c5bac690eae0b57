package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Storage-partitioned join: two bucket-partitioned DSv2 scans report
  * KeyGroupedPartitioning(identity(bucket)), and Spark's v2 bucketing
  * machinery plans their equi-join with NO shuffle on either side —
  * the property that keeps 100 TB fact-fact joins shuffle-free when
  * the store is already sharded on the join key.
  */
class GraftRangeSpjSpec extends GraftTestBase {

  private def readBucketed(start: Long, end: Long) =
    spark.read.format("graft.sources.GraftRangeSource")
      .option("start", start).option("end", end)
      .option("partitionBy", "bucket").load()

  // Match on the node ITSELF (not just children): AdaptiveSparkPlanExec
  // and QueryStageExec (incl. the Spark-4 ResultQueryStage wrapper) have
  // no children, so a child-only match silently stops at stage borders
  // and makes absence asserts vacuous.
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec        => q +: flatten(q.plan)
    case other                    => other +: other.children.flatMap(flatten)
  }

  private def allNodes(df: DataFrame): Seq[SparkPlan] = {
    df.collect() // materialize so AQE finalizes stages
    flatten(df.queryExecution.executedPlan)
  }

  private def withSpjConfs(f: => Unit): Unit = {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      // join keys (bucket, id) are a SUPERSET of the partition keys
      // (bucket); co-location on the partition-key subset is sufficient,
      // but Spark only accepts it with this conf relaxed.
      "spark.sql.requireAllClusterKeysForCoPartition" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("equi-join on (bucket, id) between two bucketed scans plans no shuffle") {
    withSpjConfs {
      val a = readBucketed(0, 10000).as("a")
      val b = readBucketed(5000, 15000).as("b")
      val joined = a.join(b,
        col("a.bucket") === col("b.bucket") && col("a.id") === col("b.id"))
        .select(col("a.id").as("id"), col("a.val").as("va"), col("b.val").as("vb"))

      val nodes = allNodes(joined)
      val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
      assert(shuffles.isEmpty,
        s"expected storage-partitioned join with no shuffle, got:\n${joined.queryExecution.executedPlan}")

      // overlap is [5000, 10000) → 5000 rows, val equal on both sides
      val rows = joined.collect()
      assert(rows.length == 5000)
      assert(rows.forall(r => r.getDouble(1) == r.getDouble(2)))
    }
  }

  test("SPJ composes with filter pushdown: narrowed ranges still co-locate") {
    withSpjConfs {
      val a = readBucketed(0, 100000).filter(col("id") >= 90000).as("a")
      val b = readBucketed(0, 100000).filter(col("id") >= 90000).as("b")
      val joined = a.join(b,
        col("a.bucket") === col("b.bucket") && col("a.id") === col("b.id"))
      val nodes = allNodes(joined)
      assert(nodes.collect { case s: ShuffleExchangeLike => s }.isEmpty)
      assert(joined.count() == 10000)
    }
  }

  test("bucketed scan still returns the exact range content") {
    val df = readBucketed(0, 997) // non-multiple of 32
    assert(df.count() == 997)
    assert(df.agg(sum("id")).collect().head.getLong(0) == 996L * 997L / 2L)
    assert(df.select("id", "bucket").collect()
      .forall(r => r.getInt(1) == (r.getLong(0) % 32).toInt))
  }

  test("with v2 bucketing disabled the same join shuffles (control)") {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val a = readBucketed(0, 2000).as("a")
      val b = readBucketed(0, 2000).as("b")
      val joined = a.join(b,
        col("a.bucket") === col("b.bucket") && col("a.id") === col("b.id"))
      val nodes = allNodes(joined)
      assert(nodes.collect { case s: ShuffleExchangeLike => s }.nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
