package graft.sources

import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** JSON source/sink extension (the reference is parquet+CSV only):
  * schema'd JSON lines round-trip with identical content, and a
  * malformed line surfaces in the _corrupt_record column instead of
  * silently vanishing. */
class JsonRoundTripSpec extends GraftTestBase {

  test("documents round-trip through JSON lines with explicit schema") {
    val docs = graft.Tables(spark, sf001)("documents").limit(100)
    val dir = java.nio.file.Files.createTempDirectory("graft_json").toString
    docs.write.mode("overwrite").json(s"$dir/docs")

    val back = spark.read.schema(docs.schema).json(s"$dir/docs")
    assert(back.schema == docs.schema)
    val a = docs.orderBy("doc_id").collect().map(_.toString)
    val b = back.orderBy("doc_id").collect().map(_.toString)
    assert(a.toSeq == b.toSeq)
  }

  test("malformed JSON lines land in _corrupt_record (PERMISSIVE mode)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_json_bad").toString
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/x.json"),
      """{"doc_id": 1, "text": "ok"}
        |{not json at all
        |{"doc_id": 2, "text": "also ok"}
        |""".stripMargin)
    val df = spark.read
      .schema("doc_id LONG, text STRING, _corrupt_record STRING")
      .json(dir)
      .cache() // corrupt-record column requires materialized parse
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    assert(df.filter(col("doc_id").isNotNull).count() == 2)
  }
}
