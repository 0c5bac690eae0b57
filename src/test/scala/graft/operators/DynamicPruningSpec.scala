package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._

import graft.{GraftTestBase, Tables}

/** Dynamic partition pruning — the partition-layout twin of broadcast
  * joins: when a partitioned fact joins a filtered dim on the partition
  * column, Spark injects the dim's post-filter key set as a runtime
  * predicate into the fact SCAN, so whole partition directories are
  * never read. At 100 TB this is the difference between scanning one
  * day and scanning five years; locally we assert the mechanism — the
  * dynamicpruning expression in the scan and the pruned partition
  * count — plus result equality against the unpartitioned join.
  */
class DynamicPruningSpec extends GraftTestBase {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => a +: flatten(a.executedPlan)
    case q: QueryStageExec        => q +: flatten(q.plan)
    case other                    => other +: other.children.flatMap(flatten)
  }

  test("dim filter prunes fact partitions at runtime via DPP") {
    val out = Files.createTempDirectory("dpp_fact").toFile.getAbsolutePath
    val orders = Tables(spark, sf001)("orders")
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(out)

    val fact = spark.read.parquet(out)
    // dim: priority -> label. Must be a real scan with a real Filter —
    // a LocalRelation dim gets constant-folded and the pruning rule
    // sees no selective predicate to derive the runtime filter from.
    import spark.implicits._
    val dimOut = Files.createTempDirectory("dpp_dim").toFile.getAbsolutePath
    Seq(("1-URGENT", "keep"), ("2-HIGH", "drop"),
        ("3-MEDIUM", "drop"), ("4-NOT SPECIFIED", "drop"),
        ("5-LOW", "drop")).toDF("prio", "label")
      .write.mode("overwrite").parquet(dimOut)
    val dim = spark.read.parquet(dimOut).filter(col("label") === "keep")

    val joined = fact.join(dim, fact("o_orderpriority") === dim("prio"))
      .select(col("o_orderkey"), col("prio"))

    // execute THIS df (count() would build its own QueryExecution and
    // leave joined's plan metrics untouched)
    val n = joined.collect().length.toLong
    val expected = orders.filter(col("o_orderpriority") === "1-URGENT").count()
    assert(n == expected && n > 0)

    // the fact scan must carry a dynamic pruning predicate...
    val scans = flatten(joined.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    val factScan = scans.find(_.output.exists(_.name == "o_orderkey")).get
    assert(factScan.partitionFilters.exists(_.toString.contains("dynamicpruning")),
      s"no dynamicpruning filter in fact scan: ${factScan.partitionFilters}")

    // ...and actually read ONE of the five partition dirs
    val metrics = factScan.metrics
    val readPartitions = metrics.get("numPartitions").map(_.value)
    assert(readPartitions.contains(1L),
      s"expected 1 partition read, metrics: ${metrics.view.mapValues(_.value).toMap}")
  }
}
