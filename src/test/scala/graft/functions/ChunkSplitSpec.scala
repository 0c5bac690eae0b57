package graft.functions

import org.apache.spark.sql.execution.GenerateExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftTestBase
import graft.functions.GraftFunctions
import graft.functions.expressions.ChunkSplit.chunkSplit

class ChunkSplitSpec extends GraftTestBase {

  test("chunks words into fixed windows, last chunk ragged") {
    import spark.implicits._
    val out = Seq("a b c d e f g").toDF("text")
      .select(chunkSplit(col("text"), lit(3)))
      .as[(Int, String)].collect().toSeq
    assert(out == Seq((0, "a b c"), (1, "d e f"), (2, "g")))
  }

  test("empty string yields one empty chunk; null text yields no rows") {
    import spark.implicits._
    val empty = Seq("").toDF("text")
      .select(chunkSplit(col("text"), lit(4))).as[(Int, String)].collect()
    assert(empty.toSeq == Seq((0, "")))
    val nul = Seq[Option[String]](None).toDF("text")
      .select(chunkSplit(col("text"), lit(4))).collect()
    assert(nul.isEmpty)
  }

  test("reachable from SQL via LATERAL VIEW and plans as GenerateExec") {
    import spark.implicits._
    GraftFunctions.register(spark)
    Seq((1L, "w x y z")).toDF("id", "text").createOrReplaceTempView("cs_docs")
    val df = spark.sql(
      """SELECT id, c.pos, c.chunk
         FROM cs_docs LATERAL VIEW chunk_split(text, 2) c AS pos, chunk""")
    assert(df.queryExecution.executedPlan.exists {
      case _: GenerateExec => true
      case _               => false
    })
    assert(df.as[(Long, Int, String)].collect().toSeq ==
      Seq((1L, 0, "w x"), (1L, 1, "y z")))
  }

  test("non-literal or non-positive size fails at analysis time") {
    import spark.implicits._
    val df = Seq("a b").toDF("text")
    intercept[Exception] {
      df.select(chunkSplit(col("text"), lit(0))).collect()
    }
    intercept[Exception] {
      df.select(chunkSplit(col("text"), length(col("text")))).collect()
    }
  }
}
