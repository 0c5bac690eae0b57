package graft.tools

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.WholeStageCodegenExec

import graft.{GraftSession, SparkEntry}

/** Plan-inspection helper: `runMain graft.tools.Explain <query> [sfDir]`
  * prints the formatted physical plan plus the two health counters the
  * plan specs assert on (exchanges, whole-stage-codegen spans). Dev
  * tool only — the driver never invokes it. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = GraftSession.local(32)
    val df = SparkEntry.queries(name)(spark, dir)
    val p: SparkPlan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.initialPlan
      case other                    => other
    }
    val nShuffle = p.collect { case e: ShuffleExchangeExec => e }.size
    val nCodegen = p.collect { case w: WholeStageCodegenExec => w }.size
    df.explain("formatted")
    println(s"SHUFFLES=$nShuffle CODEGEN_SPANS=$nCodegen")
    spark.stop()
  }
}
