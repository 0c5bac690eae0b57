package graft

/** Plan inspection utility:
  *   runMain graft.ExplainQuery <queryName> [sfDir] [mode]
  * Prints the formatted physical plan (default) so shuffle/broadcast/
  * pushdown decisions are reviewable per query.
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainQuery <queryName|all> [sfDir] [mode]")
    val name  = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode  = if (args.length > 2) args(2) else "formatted"
    val spark = GraftSession.local()
    val names = if (name == "all") SparkEntry.queries.keys.toSeq.sorted else Seq(name)
    names.foreach { n =>
      println(s"========== $n ==========")
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.explain(mode)
      // the two health counters the plan specs assert on
      val p = df.queryExecution.executedPlan match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.initialPlan
        case other => other
      }
      val nShuffle = p.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
      val nCodegen = p.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.size
      println(s"SHUFFLES=$nShuffle CODEGEN_SPANS=$nCodegen")
    }
    spark.stop()
  }
}
