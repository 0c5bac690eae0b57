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
    // optional args restrict the set (local iteration); the driver
    // passes none, so its contract is the full sorted suite
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => args.isEmpty || args.contains(n))
    val results = names.map { n =>
      val a = runOnce(n); val b = runOnce(n)
      n -> (if (a < 0 || b < 0) -1.0 else math.min(a, b))
    }
    def f(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    def jmap(rs: Seq[(String, Double)]): String =
      rs.map { case (k, v) => "\"" + k + "\":" + f(v) }.mkString("{", ",", "}")
    val total  = results.map(_._2).filter(_ >= 0).sum
    val failed = results.filter(_._2 < 0).map(_._1)

    // Full per-query timings → file (the driver keeps only a ~2000-char
    // tail of stdout, so the 123-entry map cannot ride the stdout line).
    val full =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","n_queries":${results.size},""" +
      s""""failed":${failed.map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
      s""""queries":${jmap(results)},"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(sys.props.getOrElse("user.dir", "."), "BENCH_FULL.json"),
      (full + "\n").getBytes("UTF-8"))

    // Compact stdout line for the driver: headline queries only (one per
    // major operator family, plus every entry that dominates runtime),
    // sized to survive the tail-window truncation that left rounds 1-3
    // with parsed=null. `value` still totals ALL queries.
    val headlineSubset = results.filter { case (k, _) => Bench.headline(k) }
    println(
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":${jmap(headlineSubset)},""" +
      s""""sf":"$sfDir","n_queries":${results.size},"n_failed":${failed.size},"full":"BENCH_FULL.json"}""")
    spark.stop()
  }

  /** Headline benchmark set: one representative per operator family plus
    * every query that individually costs >1s at sf0.1. The full 123-query
    * map lands in BENCH_FULL.json.
    */
  private val headline: Set[String] = Set(
    "q01_pricing_summary", "q03_join_revenue", "q08_except_all",
    "q13_window_topk", "q16_fk_integrity", "q21_token_stats",
    "q24_ngram_jaccard", "q26_minhash_lsh", "q343_minhash_scale",
    "q29_cosine_topk",
    "q31_embedding_dedup", "q33_sessionize", "q38_sql_surface",
    "q39_approx_distinct", "q40_range_join", "q47_percentiles",
    "q58_tfidf", "q60_ivf_ann", "q61_stream_stream_join",
    "q64_corpus_pipeline", "q65_dup_clusters", "q68_sql_subqueries",
    "q75_decontaminate", "q84_tws_profile", "q87_session_window",
    "q91_asof_native", "q101_cdc_merge", "q118_recursive_cte")
}
