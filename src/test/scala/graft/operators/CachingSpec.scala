package graft.operators

import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{GraftTestBase, Tables}

/** Caching surface: persist() must actually serve follow-up reads from
  * the in-memory store (InMemoryTableScan in the plan), honor the
  * requested storage level, and release cleanly on unpersist. Iterative
  * operators (ConnectedComponents, IVF) lean on materialization — this
  * pins the substrate they assume. */
class CachingSpec extends GraftTestBase {

  import org.apache.spark.sql.execution.SparkPlan
  import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

  private def finalNodes(df: org.apache.spark.sql.DataFrame): Seq[SparkPlan] = {
    df.collect()
    def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
      case q: QueryStageExec        => p +: flatten(q.plan)
      case _                        => p +: p.children.flatMap(flatten)
    }
    flatten(df.queryExecution.executedPlan)
  }

  test("persisted frame serves reads via InMemoryTableScan and unpersists clean") {
    val df = Tables(spark, sf001)("lineitem")
      .groupBy("l_returnflag").agg(sum("l_quantity").as("q"))
      .persist(StorageLevel.MEMORY_ONLY)
    try {
      assert(df.count() == 3) // materialize
      val nodes = finalNodes(df.filter(col("q") > 0))
        .collect { case s: InMemoryTableScanExec => s }
      assert(nodes.nonEmpty, "read did not hit the cache")
      assert(df.storageLevel == StorageLevel.MEMORY_ONLY)
    } finally df.unpersist(blocking = true)
    assert(df.storageLevel == StorageLevel.NONE)
  }

  test("cache is plan-keyed: an equivalent query reuses it") {
    val base = Tables(spark, sf001)("orders").filter(col("o_totalprice") > 1000)
    base.cache()
    try {
      base.count()
      // A freshly-built, structurally identical plan must also hit it.
      val twin = Tables(spark, sf001)("orders").filter(col("o_totalprice") > 1000)
      val hits = finalNodes(twin).collect { case s: InMemoryTableScanExec => s }
      assert(hits.nonEmpty, "equivalent plan bypassed the cache")
    } finally base.unpersist(blocking = true)
  }
}
