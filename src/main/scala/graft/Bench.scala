package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at SPARK_GRAFT_SF_DIR
  * and prints ONE JSON line for the driver.
  *
  * Each query materializes through the `noop` sink — `count()` would let
  * Catalyst prune the computed columns away (a pricing-summary "bench"
  * that never computes prices), while noop executes the full plan and
  * discards rows without sink I/O. One cheap warm-up query absorbs
  * session/codegen init so per-query numbers measure the plans, not JVM
  * startup.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus  = GraftSession.defaultCpus
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up: session init, parquet footer cache, codegen compiler
    runOnce("q01_pricing_summary")

    // min of two runs per query: second run reuses compiled codegen and
    // cached footers, so the minimum reflects plan cost, not JVM noise.
    // A failure in EITHER run marks the query failed (-1) — one flaky
    // crash must not hide behind the other run's time.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val results = names.map { n =>
      val a = runOnce(n); val b = runOnce(n)
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
