package graft.queries

import org.apache.spark.sql.execution.window.WindowGroupLimitExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

import graft.GraftTestBase

/** SQL-surface machinery pinned at the plan/catalog level. */
class SqlSurfaceSpec extends GraftTestBase {

  test("window top-k plans a PARTIAL WindowGroupLimit before the shuffle") {
    val df = graft.SparkEntry.queries("q13_window_topk")(spark, sf001)
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    val limits = plan.collect { case w: WindowGroupLimitExec => w }
    // Partial (map-side, before the hash exchange: each task keeps only
    // its local top-k — the thing that makes rank()<=k survivable when
    // one customer has a billion orders) + Final after the shuffle
    assert(limits.size == 2,
      s"expected Partial+Final WindowGroupLimit, got ${limits.size}")
    assert(limits.map(_.mode.toString).toSet == Set("Partial", "Final"))
  }

  test("SQL-defined scalar function (CREATE FUNCTION ... RETURN)") {
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS tok_est")
    // a SQL UDF body is Catalyst expressions — inlined into the plan,
    // codegen'd, nothing like a black-box scala_udf
    spark.sql(
      """CREATE TEMPORARY FUNCTION tok_est(s STRING)
         RETURNS INT RETURN size(split(s, ' '))""")
    val n = spark.sql(
      "SELECT tok_est('a b c') AS n").head.getInt(0)
    assert(n == 3)
    // composes with tables and aggregates
    graft.Tables(spark, sf001).registerAll()
    val avg = spark.sql(
      "SELECT avg(tok_est(text)) AS a FROM documents").head.getDouble(0)
    assert(avg > 1.0)
  }

  test("SQL table function (CREATE FUNCTION ... RETURNS TABLE)") {
    spark.sql("DROP TEMPORARY FUNCTION IF EXISTS id_range")
    spark.sql(
      """CREATE TEMPORARY FUNCTION id_range(n INT)
         RETURNS TABLE (i INT)
         RETURN SELECT explode(sequence(1, n))""")
    import spark.implicits._
    val got = spark.sql("SELECT i FROM id_range(4)").as[Int].collect().sorted
    assert(got.toSeq == Seq(1, 2, 3, 4))
  }
}
