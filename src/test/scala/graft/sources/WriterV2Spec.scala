package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll

import graft.GraftTestBase

/** The typed v2 writer APIs against the catalog: df.writeTo (create /
  * append / replace) and the Spark 4 MergeIntoWriter builder
  * (df.mergeInto(...).whenMatched/whenNotMatched...) — the programmatic
  * twins of CTAS / INSERT / MERGE INTO SQL. */
class WriterV2Spec extends GraftTestBase with BeforeAndAfterAll {

  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    spark.conf.set("spark.sql.catalog.gcat", classOf[GraftCatalog].getName)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcat.db")
  }

  test("writeTo: create, append, replace") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.w2")
    Seq((1, "a"), (2, "b")).toDF("k", "v").writeTo("gcat.db.w2").create()
    Seq((3, "c")).toDF("k", "v").writeTo("gcat.db.w2").append()
    assert(spark.table("gcat.db.w2").count() == 3)
    Seq((9, "z")).toDF("k", "v").writeTo("gcat.db.w2").replace()
    val got = spark.table("gcat.db.w2").collect()
      .map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((9, "z")))
  }

  test("mergeInto builder: matched update, not-matched insert, matched delete") {
    spark.sql("DROP TABLE IF EXISTS gcat.db.m2")
    spark.sql("CREATE TABLE gcat.db.m2 (k INT, v STRING)")
    spark.sql("INSERT INTO gcat.db.m2 VALUES (1, 'old'), (2, 'stale'), (3, 'keep')")
    val source = Seq((1, "new"), (2, "DELETE"), (4, "fresh"))
      .toDF("k", "v").as("src")
    source.mergeInto("gcat.db.m2", $"src.k" === col("gcat.db.m2.k"))
      .whenMatched($"src.v" === "DELETE").delete()
      .whenMatched().update(Map("v" -> $"src.v"))
      .whenNotMatched().insertAll()
      .merge()
    val got = spark.sql("SELECT k, v FROM gcat.db.m2 ORDER BY k")
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(got.toSeq == Seq((1, "new"), (3, "keep"), (4, "fresh")))
  }
}
