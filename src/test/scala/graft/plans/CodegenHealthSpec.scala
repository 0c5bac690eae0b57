package graft.plans

import org.apache.logging.log4j.{Level, LogManager}
import org.apache.logging.log4j.core.appender.AbstractAppender
import org.apache.logging.log4j.core.config.Property
import org.apache.logging.log4j.core.{LogEvent, LoggerContext}

import graft.{GraftTestBase, SparkEntry}

/** Suite-wide codegen-health guard: a representative query slice runs
  * with (a) `spark.sql.codegen.fallback=false`, so any whole-stage
  * Janino compile failure ABORTS the query instead of silently
  * degrading to interpreted eval, and (b) a log4j2 appender on Spark's
  * `CodeGenerator` loggers, so a fallback that logs ERROR without
  * throwing (the failure mode the round-4 V2-ScalarFunction bug hid
  * behind) also fails the spec. Catches the whole class of
  * "results pass, hot path is secretly interpreted" bugs for every
  * native expression, catalog function, and sketch in the slice. */
class CodegenHealthSpec extends GraftTestBase {

  /** Collects ERROR+ events from codegen-related loggers. */
  private class CodegenErrorCollector
      extends AbstractAppender(
        "graft-codegen-guard", null, null, true, Property.EMPTY_ARRAY) {
    val errors = new java.util.concurrent.ConcurrentLinkedQueue[String]
    override def append(e: LogEvent): Unit =
      if (e.getLevel.isMoreSpecificThan(Level.ERROR) &&
          e.getLoggerName.contains("codegen"))
        errors.add(
          s"${e.getLoggerName}: ${e.getMessage.getFormattedMessage.take(400)}")
  }

  // every family with a custom doGenCode or a codegen-sensitive path:
  // native expressions (minhash/simhash/rolling-hash/dot-product/
  // sas-date/interleave), catalog V2 functions, typed aggregators,
  // sketches, window/text/asof members of the suite
  private val slice = Seq(
    "q01_pricing_summary",  // agg core
    "q10_calendar_dim",     // SasToDate expression
    "q13_window_topk",      // window functions
    "q26_minhash_lsh",      // MinHashSignature (xxhash family)
    "q27_simhash",          // SimHash64
    "q29_cosine_topk",      // DotProduct
    "q34_asof_join",        // custom as-of plan
    "q41_typed_aggregator", // typed Aggregator codegen bridge
    "q45_rolling_hash",     // RollingHash
    "q58_tfidf",            // text aggregates
    "q63_topk_heap",        // TopK
    "q73_variant",          // variant type
    "q83_bitmap_distinct",  // bitmap aggs
    "q91_asof_native",
    "q102_hll_sketch",
    "q116_cms_probe",       // CountMinSketch typed agg
    "q212_char_trigrams",
    "q285_ewma",
    "q325_cms_audit",
    "q333_sq8_error",       // quantization arithmetic
    "q343_minhash_scale",   // ShingleMinHash + MinHashFromHashes
    "q344_simhash_scale",   // TextSimHash
    "q345_semantic_dedup",  // inlined-centroid argmax + DotProduct
    "q348_substring_profile", // gram-window substring dedup (round 7)
    "q351_quantile_sketch",   // bottom-k sample + exact-percentile audit
    "q354_dp_release",        // md5-uniform Laplace arithmetic
    "q356_kmv_distinct"       // KMV estimator + WindowGroupLimit path
  )

  test("representative slice compiles clean: no codegen ERROR, no fallback") {
    val ctx = LogManager.getContext(false).asInstanceOf[LoggerContext]
    val cfg = ctx.getConfiguration
    val collector = new CodegenErrorCollector
    collector.start()
    cfg.getRootLogger.addAppender(collector, Level.ERROR, null)
    ctx.updateLoggers()
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val qs = SparkEntry.queries
      slice.foreach { name =>
        assert(qs.contains(name), s"slice names a missing query: $name")
        qs(name)(spark, sf001).collect() // full execution, not just count
      }
      // catalog V2 scalar + aggregate functions (the round-4 regression)
      spark.conf.set("spark.sql.catalog.gcat",
        classOf[graft.sources.GraftCatalog].getName)
      graft.Tables(spark, sf001).registerAll()
      spark.sql(
        """SELECT gcat.system.cents(l_extendedprice) AS c,
                  gcat.system.clamp(l_quantity, 5.0d, 40.0d) AS q,
                  gcat.system.cents_sum(l_extendedprice) OVER () AS t
           FROM lineitem LIMIT 50""").collect()
      val seen = collector.errors.toArray(Array.empty[String])
      assert(seen.isEmpty,
        s"codegen ERROR fallbacks detected:\n${seen.mkString("\n")}")
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", "true")
      cfg.getRootLogger.removeAppender("graft-codegen-guard")
      collector.stop()
      ctx.updateLoggers()
    }
  }
}
