package graft.sources

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SaveMode

import graft.GraftTestBase

class GraftMemorySinkSpec extends GraftTestBase {

  private val fmt = "graft.sources.GraftMemorySink"
  import spark.implicits._

  private def readBack(name: String) =
    spark.read.format(fmt).option("name", name).load()

  test("append accumulates across writes; read-back round-trips values") {
    GraftMemoryStore.drop("t_append")
    Seq((1L, "a"), (2L, "b")).toDF("k", "s")
      .write.format(fmt).option("name", "t_append").mode(SaveMode.Append).save()
    Seq((3L, "c")).toDF("k", "s")
      .write.format(fmt).option("name", "t_append").mode(SaveMode.Append).save()
    val got = readBack("t_append").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("overwrite truncates atomically inside commit") {
    GraftMemoryStore.drop("t_over")
    Seq((1L, "old")).toDF("k", "s")
      .write.format(fmt).option("name", "t_over").mode(SaveMode.Append).save()
    Seq((9L, "new"), (10L, "new2")).toDF("k", "s")
      .write.format(fmt).option("name", "t_over").mode(SaveMode.Overwrite).save()
    val got = readBack("t_over").as[(Long, String)].collect().toSet
    assert(got == Set((9L, "new"), (10L, "new2")))
  }

  test("a failed job aborts: nothing becomes visible, prior data intact") {
    GraftMemoryStore.drop("t_abort")
    Seq((1L, "keep")).toDF("k", "s")
      .write.format(fmt).option("name", "t_abort").mode(SaveMode.Append).save()

    val boom = udf((k: Long) => {
      if (k == 3L) throw new RuntimeException("boom"); k
    })
    val failing = Seq(2L, 3L, 4L).toDF("k")
      .withColumn("k", boom(col("k"))).withColumn("s", lit("partial"))
    intercept[Exception] {
      failing.write.format(fmt).option("name", "t_abort")
        .mode(SaveMode.Overwrite).save()
    }
    // overwrite failed BEFORE commit → truncation never happened and no
    // partial rows from succeeding tasks leaked in
    val got = readBack("t_abort").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "keep")))
  }

  test("multi-partition write: every task's rows arrive exactly once") {
    GraftMemoryStore.drop("t_par")
    spark.range(0, 1000).repartition(8)
      .withColumn("v", col("id") * 2)
      .write.format(fmt).option("name", "t_par").mode(SaveMode.Append).save()
    val got = readBack("t_par")
    assert(got.count() == 1000)
    assert(got.agg(sum("id"), sum("v")).as[(Long, Long)].head() ==
      ((999L * 1000 / 2, 999L * 1000)))
  }
}
