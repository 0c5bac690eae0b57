package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.GraftTestBase

/** Corrupt-input handling — the three parser modes every 100 TB ingest
  * decides between: PERMISSIVE (quarantine into _corrupt_record, the
  * only mode that never loses good rows), DROPMALFORMED (silent loss,
  * but the pipeline stays up), FAILFAST (fail the job — right when
  * corruption means upstream breakage). */
class MalformedRecordsSpec extends GraftTestBase {

  private lazy val dir = {
    val d = Files.createTempDirectory("badjson").toFile.getAbsolutePath
    Files.writeString(Paths.get(s"$d/data.jsonl"),
      """{"id": 1, "v": 10.5}
        |{"id": 2, "v": "not-a-number"}
        |this is not json at all
        |{"id": 4, "v": 40.0}
        |""".stripMargin)
    d
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", DoubleType),
    StructField("_corrupt_record", StringType)))

  test("PERMISSIVE quarantines bad rows into _corrupt_record, keeps good ones") {
    val df = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(dir).cache()
    assert(df.count() == 4)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 2)
    assert(df.filter(col("_corrupt_record").isNull)
      .agg(sum("v")).head.getDouble(0) == 50.5)
    df.unpersist()
  }

  test("DROPMALFORMED silently keeps only parseable rows") {
    val df = spark.read
      .schema(StructType(schema.fields.filterNot(_.name.startsWith("_"))))
      .option("mode", "DROPMALFORMED").json(dir)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
  }

  test("FAILFAST raises on the first malformed row") {
    val e = intercept[org.apache.spark.SparkException] {
      spark.read
        .schema(StructType(schema.fields.filterNot(_.name.startsWith("_"))))
        .option("mode", "FAILFAST").json(dir).collect()
    }
    // the malformed-record error arrives wrapped in FAILED_READ_FILE
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage.toLowerCase).toSeq
    assert(messages.exists(m => m.contains("malformed")),
      s"no malformed-record cause in: $messages")
  }
}
