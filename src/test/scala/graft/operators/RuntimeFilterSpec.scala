package graft.operators

import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

/** Spark's own runtime row-level filters (InjectRuntimeFilter): for a
  * selective equi-join on a NON-partition column, the optimizer builds
  * a bloom filter from the small (creation) side and applies
  * might_contain on the big (application) side BEFORE the shuffle —
  * rows that cannot join are dropped at the scan, so at 100 TB the
  * shuffle moves the matching fraction instead of the whole fact.
  * (graft's own BloomJoin predates this for manual control; this spec
  * pins the built-in so both paths are covered.)
  */
class RuntimeFilterSpec extends GraftTestBase {

  test("selective join injects a bloom runtime filter on the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // local data is tiny: drop the size gates so injection applies
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      // keep the join a shuffle join so the filter has a shuffle to save
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = Tables(spark, sf001)("lineitem")
      val selectiveOrders = Tables(spark, sf001)("orders")
        .filter(col("o_orderpriority") === "1-URGENT" &&
                col("o_totalprice") > 200000)
        .select("o_orderkey")
      val joined = li.join(selectiveOrders, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_quantity"))

      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("might_contain") ||
             optimized.contains("bloom_filter"),
        s"no runtime bloom filter injected:\n$optimized")

      // correctness unchanged by the filter
      val expected = li.join(
        Tables(spark, sf001)("orders")
          .filter(col("o_orderpriority") === "1-URGENT" &&
                  col("o_totalprice") > 200000)
          .select(col("o_orderkey").as("ok")),
        col("l_orderkey") === col("ok"))
      assert(joined.count() == expected.count() && joined.count() > 0)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
