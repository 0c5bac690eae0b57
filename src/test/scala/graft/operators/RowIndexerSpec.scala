package graft.operators

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftTestBase
import graft.operators.RowIndexer

class RowIndexerSpec extends GraftTestBase {

  test("ids are contiguous, 0-based, and follow the declared order") {
    import spark.implicits._
    val df = spark.sparkContext.parallelize(
      Seq(("d", 4), ("a", 1), ("c", 3), ("b", 2), ("e", 5)), numSlices = 3)
      .toDF("k", "v")
    val out = RowIndexer.stableIndex(df, Seq(col("k")), numPartitions = Some(3))
      .orderBy("idx").collect()
    assert(out.map(_.getString(0)).toSeq == Seq("a", "b", "c", "d", "e"))
    assert(out.map(_.getLong(2)).toSeq == (0L to 4L))
  }

  test("matches row_number()-1 on the documents table") {
    val d = graft.Tables(spark, sf001).documents.select(col("doc_id"))
    val got = RowIndexer.stableIndex(d, Seq(col("doc_id")), numPartitions = Some(5))
      .orderBy("doc_id")
      .select(col("doc_id"), col("idx")).collect()
    val want = d.select(col("doc_id"),
        (row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("doc_id"))) - 1).cast("long").as("idx"))
      .orderBy("doc_id").collect()
    assert(got.toSeq == want.toSeq)
  }

  test("ntileBucket is bit-identical to ntile() for every n/k edge shape") {
    import spark.implicits._
    // n < k, n = k, k | n, remainder cases, k = 1
    for ((n, k) <- Seq((3, 10), (10, 10), (40, 10), (43, 10), (7, 3), (9, 1))) {
      val df = (0L until n.toLong).toDF("v")
      val want = df.select(col("v"),
          ntile(k).over(org.apache.spark.sql.expressions.Window
            .orderBy(col("v"))).as("b"))
        .orderBy("v").collect().map(_.getInt(1)).toSeq
      val got = RowIndexer.stableIndex(df, Seq(col("v")))
        .select(col("v"), RowIndexer.ntileBucket("idx", n.toLong, k).as("b"))
        .orderBy("v").collect().map(_.getInt(1)).toSeq
      assert(got == want, s"n=$n k=$k: $got != $want")
    }
  }

  test("plans without a global single-partition Window") {
    val d = graft.Tables(spark, sf001).documents.select(col("doc_id"))
    val indexed = RowIndexer.stableIndex(d, Seq(col("doc_id")))
    // the whole point: no WindowExec anywhere (row_number's global window
    // would execute on ONE partition at 100 TB)
    val hasWindow = indexed.queryExecution.executedPlan.exists {
      case _: WindowExec => true
      case _             => false
    }
    assert(!hasWindow)
    // and ids stay partition-distributed before any orderBy
    assert(indexed.rdd.getNumPartitions > 1)
  }
}
