package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.GraftTestBase

class GraftRangeSourceSpec extends GraftTestBase {

  private def read(end: Long, slices: Int) =
    spark.read.format("graft.sources.GraftRangeSource")
      .option("end", end).option("slices", slices).load()

  private def batchScan(df: org.apache.spark.sql.DataFrame): BatchScanExec =
    df.queryExecution.executedPlan.collectFirst { case b: BatchScanExec => b }.get

  test("produces the deterministic range with all three columns") {
    val rows = read(100, 4).orderBy("id").collect()
    assert(rows.length == 100)
    assert(rows(7).getLong(0) == 7L)
    assert(rows(7).getDouble(1) == ((7L * 2654435761L) % 1000003L).toDouble / 1000003.0)
    assert(rows(7).getInt(2) == 7)
    assert(rows(39).getInt(2) == 7) // 39 % 32
  }

  test("id range filters are pushed down and prune input partitions") {
    val df = read(1000000, 100).filter(col("id") >= 990000 && col("id") < 990100)
    // 100 slices over [0, 1e6) are 10k rows each; the narrowed scan
    // [990000, 990100) spans 100 rows → the planner must see the
    // narrowed bounds, not the full range (which would plan 100 slices).
    val scan = batchScan(df)
    assert(scan.inputRDD.getNumPartitions < 100,
      s"expected pruned partitions, got ${scan.inputRDD.getNumPartitions}")
    assert(df.count() == 100)
    assert(df.agg(min("id"), max("id")).collect().head.toSeq ==
      Seq(990000L, 990099L))
  }

  test("equality pushdown narrows to a single-row scan") {
    val df = read(1000000, 100).filter(col("id") === 123456)
    assert(batchScan(df).inputRDD.getNumPartitions == 1)
    val r = df.collect()
    assert(r.length == 1 && r.head.getLong(0) == 123456L)
  }

  test("unsupported predicates stay as residual filters and still apply") {
    // bucket is not a pushable column — the connector must return it as
    // residual and Spark must evaluate it post-scan.
    val df = read(1000, 4).filter(col("bucket") === 3)
    assert(df.count() == 1000 / 32 + (if (3 < 1000 % 32) 1 else 0))
    assert(df.select("id").as[Long](spark.implicits.newLongEncoder)
      .collect().forall(_ % 32 == 3))
  }

  test("column pruning reaches the reader schema") {
    val df = read(1000, 4).select("id")
    val scan = batchScan(df)
    assert(scan.scan.readSchema().fieldNames.toSeq == Seq("id"))
    assert(df.agg(sum("id")).collect().head.getLong(0) == 999L * 1000L / 2L)
  }

  test("empty result when pushdown collapses the range") {
    val df = read(1000, 4).filter(col("id") > 5000)
    assert(df.count() == 0)
  }

  test("ungrouped count/min/max push COMPLETELY into the connector (O(1) over a trillion rows)") {
    // A scan this size could never enumerate; only O(1) bound
    // arithmetic can answer it in time.
    val trillion = 1000000000000L
    val df = read(trillion, 8)
      .filter(col("id") >= 17 && col("id") < trillion - 3)
      .agg(count(lit(1)).as("n"), min("id").as("lo"), max("id").as("hi"))
    val r = df.collect().head
    assert(r.getLong(0) == trillion - 3 - 17)
    assert(r.getLong(1) == 17L && r.getLong(2) == trillion - 4)
    assert(batchScan(df).scan.description().contains("graftrange-agg"))
  }

  test("grouped or non-id aggregates decline pushdown and still answer correctly") {
    // grouped/val-typed plans go adaptive, so inspect the plan string
    val df = read(1000, 4).groupBy(col("bucket")).agg(count(lit(1)).as("n"))
    assert(!df.queryExecution.executedPlan.toString.contains("graftrange-agg"))
    assert(df.agg(sum("n")).collect().head.getLong(0) == 1000L)
    val v = read(1000, 4).agg(min("val"))
    assert(!v.queryExecution.executedPlan.toString.contains("graftrange-agg"))
    assert(v.collect().head.getDouble(0) >= 0.0)
  }
}
