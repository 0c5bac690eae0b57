package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

import graft.GraftTestBase

/** Cost-based optimization: table/column statistics (ANALYZE TABLE)
  * driving plan choices. At 100 TB the size-in-bytes heuristic sees a
  * filtered dimension as "most of the file" and refuses to broadcast
  * it; CBO's FilterEstimation uses ndv/min/max column stats to see the
  * filter's real selectivity, unlocking the broadcast. This is the
  * statistics half of the scale story — AQE (AqeSpec) is the runtime
  * half; CBO fixes the plan BEFORE execution, which matters when the
  * wrong initial plan would already have shuffled 100 TB.
  */
class CboSpec extends GraftTestBase {

  private val cboConfs = Seq(
    "spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled",
    "spark.sql.autoBroadcastJoinThreshold")

  private def withSaved[A](keys: Seq[String])(body: => A): A = {
    val saved = keys.map(k => k -> spark.conf.getOption(k))
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def initialJoins(df: DataFrame): Seq[SparkPlan] = {
    // CBO acts at planning time: inspect the INITIAL plan, before AQE's
    // runtime re-planning can mask what the estimator decided
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case p                        => p
    }
    plan.collect {
      case j: BroadcastHashJoinExec => j
      case j: SortMergeJoinExec     => j
    }
  }

  test("ANALYZE column stats shrink the filtered-dim estimate and flip the join") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cbo").toString
    val t = graft.Tables(spark, sf001)
    // catalog-backed copies (stats live in the catalog, not on raw paths)
    t("orders").write.mode("overwrite")
      .option("path", s"$tmp/fact").saveAsTable("cbo_fact")
    t("customer").write.mode("overwrite")
      .option("path", s"$tmp/dim").saveAsTable("cbo_dim")
    spark.sql("ANALYZE TABLE cbo_fact COMPUTE STATISTICS FOR ALL COLUMNS")
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR ALL COLUMNS")

    // ~1% of customers; c_name carried so the dim is not pruned to the key
    def q(): DataFrame = spark.sql(
      """SELECT d.c_name, count(*) AS n
         FROM cbo_fact f JOIN cbo_dim d ON f.o_custkey = d.c_custkey
         WHERE d.c_custkey <= 15
         GROUP BY d.c_name""")
    def filteredDim(): DataFrame = spark.sql(
      "SELECT c_custkey, c_name FROM cbo_dim WHERE c_custkey <= 15")

    withSaved(cboConfs) {
      // the estimator's own numbers, not guesses about them
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val naive = filteredDim().queryExecution.optimizedPlan.stats.sizeInBytes
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = filteredDim().queryExecution.optimizedPlan.stats
      assert(stats.sizeInBytes * 2 <= naive,
        s"CBO did not shrink the filter estimate: cbo=${stats.sizeInBytes} naive=$naive")
      assert(stats.rowCount.exists(rc => rc >= 1 && rc <= 50),
        s"CBO rowCount estimate off: ${stats.rowCount}")

      // threshold between the two estimates: the SAME query plans SMJ
      // under the naive size and broadcast under the CBO size
      val threshold = (stats.sizeInBytes + naive) / 2
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold.toString)

      spark.conf.set("spark.sql.cbo.enabled", "false")
      val without = initialJoins(q())
      assert(without.exists(_.isInstanceOf[SortMergeJoinExec]),
        s"expected SMJ without CBO, got: $without")

      spark.conf.set("spark.sql.cbo.enabled", "true")
      val withCbo = initialJoins(q())
      assert(withCbo.exists(_.isInstanceOf[BroadcastHashJoinExec]),
        s"expected broadcast join with CBO stats, got: $withCbo")

      // same answer either way
      spark.conf.set("spark.sql.cbo.enabled", "false")
      val a = q().orderBy("c_name").collect().toSeq
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val b = q().orderBy("c_name").collect().toSeq
      assert(a == b && a.nonEmpty)
    }
    spark.sql("DROP TABLE IF EXISTS cbo_fact")
    spark.sql("DROP TABLE IF EXISTS cbo_dim")
  }

  test("catalog row counts survive ANALYZE and are visible to the optimizer") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_cbo2").toString
    graft.Tables(spark, sf001)("nation").write.mode("overwrite")
      .option("path", s"$tmp/n").saveAsTable("cbo_nation")
    try withSaved(Seq("spark.sql.cbo.enabled")) {
      spark.sql("ANALYZE TABLE cbo_nation COMPUTE STATISTICS")
      spark.conf.set("spark.sql.cbo.enabled", "true")
      val stats = spark.table("cbo_nation").queryExecution
        .optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(25)),
        s"expected rowCount=25 in catalog stats, got ${stats.rowCount}")
    } finally spark.sql("DROP TABLE IF EXISTS cbo_nation")
  }
}
