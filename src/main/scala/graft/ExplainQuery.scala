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
      SparkEntry.queries(n)(spark, sfDir).explain(mode)
    }
    spark.stop()
  }
}
