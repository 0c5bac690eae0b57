package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{GraftTestBase, Tables}

/** Source/sink format coverage beyond parquet + CSV (which the
  * capstone pipeline itself exercises): ORC, JSON-lines, and text —
  * written and read back row-exactly. Each write uses the same
  * overwrite-mode path a production sink would. */
class FormatsSpec extends GraftTestBase {

  private lazy val sample = Tables(spark, sf001)("lineitem")
    .select("l_orderkey", "l_partkey", "l_quantity", "l_returnflag", "l_shipdate")
    .limit(500)

  private def tmp(name: String): String =
    Files.createTempDirectory(s"fmt_$name").resolve("out").toString

  test("ORC round trip preserves rows and schema") {
    val dir = tmp("orc")
    sample.write.mode("overwrite").orc(dir)
    val back = spark.read.orc(dir)
    assert(back.schema == sample.schema)
    assert(back.exceptAll(sample).isEmpty && sample.exceptAll(back).isEmpty)
  }

  test("ORC predicate pushdown reaches the scan") {
    val dir = tmp("orcp")
    sample.write.mode("overwrite").orc(dir)
    val plan = spark.read.orc(dir).filter(col("l_orderkey") === 42)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("l_orderkey"),
      s"no pushdown in:\n$plan")
  }

  test("JSON-lines round trip preserves values (schema re-asserted on read)") {
    val dir = tmp("json")
    sample.write.mode("overwrite").json(dir)
    // JSON carries no schema; production readers pin it explicitly
    // rather than paying an inference pass over 100 TB.
    val back = spark.read.schema(sample.schema).json(dir)
    assert(back.exceptAll(sample).isEmpty && sample.exceptAll(back).isEmpty)
  }

  test("text source reads raw lines; lineSep and wholetext honored") {
    val dir = tmp("text")
    sample.select(concat_ws("|",
        col("l_orderkey"), col("l_returnflag")).as("value"))
      .write.mode("overwrite").text(dir)
    val lines = spark.read.text(dir)
    assert(lines.schema == StructType(Seq(StructField("value", StringType))))
    assert(lines.count() == 500)
    val parsed = lines.select(
      split(col("value"), "\\|").getItem(0).cast("long").as("l_orderkey"),
      split(col("value"), "\\|").getItem(1).as("l_returnflag"))
    assert(parsed.exceptAll(sample.select("l_orderkey", "l_returnflag")).isEmpty)
  }

  test("CSV with explicit schema, custom delimiter and header round trips") {
    val dir = tmp("csv")
    sample.write.mode("overwrite").option("header", "true")
      .option("delimiter", ";").csv(dir)
    val back = spark.read.schema(sample.schema)
      .option("header", "true").option("delimiter", ";").csv(dir)
    assert(back.exceptAll(sample).isEmpty && sample.exceptAll(back).isEmpty)
  }
}
