package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.GraftTestBase

/** Golden-output parity: each builder, run in referenceCompat mode over
  * the reference's own inputs (/root/reference/data), must reproduce the
  * committed pipeline outputs (/root/reference/s3a/udatalake) — the
  * de-facto golden snapshot of one full reference run (SURVEY.md §5).
  *
  * Small tables compare row-for-row; the 3.1M-row fact compares via
  * count + grouped/checksum aggregates (full row diff would add minutes
  * for no extra signal).
  */
class EtlGoldenSpec extends GraftTestBase {

  private val dataRoot  = "/root/reference/data"
  private val goldenDir = "/root/reference/s3a/udatalake"
  private val compat    = CompatConfig.referenceCompat

  private def golden(leaf: String): DataFrame =
    spark.read.parquet(s"$goldenDir/$leaf")

  private def assertSameRows(got: DataFrame, want: DataFrame): Unit = {
    assert(got.columns.toSeq == want.columns.toSeq,
      s"columns ${got.columns.toSeq} != ${want.columns.toSeq}")
    val g = got.collect().map(_.toString).sorted
    val w = want.collect().map(_.toString).sorted
    assert(g.length == w.length, s"rows ${g.length} != ${w.length}")
    g.zip(w).foreach { case (a, b) => assert(a == b, s"$a != $b") }
  }

  test("trans-mode dim matches committed i94mode.parquet") {
    assertSameRows(CapstonePipeline.transModeDim(spark), golden("i94mode.parquet"))
  }

  test("visa dim matches committed i94visa.parquet") {
    assertSameRows(CapstonePipeline.visaDim(spark), golden("i94visa.parquet"))
  }

  test("demographics dim matches committed us_cities_demographics.parquet") {
    assertSameRows(
      CapstonePipeline.demographicsDim(spark, s"$dataRoot/us-cities-demographics.csv"),
      golden("us_cities_demographics.parquet"))
  }

  test("country dim matches committed country.parquet (dead join reproduced)") {
    assertSameRows(
      CapstonePipeline.countryDim(spark, s"$dataRoot/I94CIT_I94RES.csv", None, compat),
      golden("country.parquet"))
  }

  test("calendar dim matches committed i94date.parquet") {
    val fact = CapstonePipeline.immigrationFact(spark, s"$dataRoot/sas_data", compat)
    assertSameRows(CapstonePipeline.calendarDim(fact, compat), golden("i94date.parquet"))
  }

  test("immigration fact matches committed immigration.parquet on count + checksums") {
    val got  = CapstonePipeline.immigrationFact(spark, s"$dataRoot/sas_data", compat)
    val want = golden("immigration.parquet")
    assert(got.columns.toSeq == want.columns.toSeq)

    def sig(df: DataFrame) = df.agg(
      count(lit(1)), round(sum("cicid"), 2), round(sum("arrdate"), 2),
      sum(when(col("gender").isNull, 1).otherwise(0)),
      sum(when(col("i94addr").isNull, 1).otherwise(0))).collect().head.toString
    assert(sig(got) == sig(want))

    def byMode(df: DataFrame) = df.groupBy("i94mode").count()
      .collect().map(_.toString).sorted.toSeq
    assert(byMode(got) == byMode(want))
    // B2 reproduced: 239 null-mode rows filled with 0, not 9
    assert(got.filter(col("i94mode") === 0).count() == 239)
  }

  test("B1 check surfaces the duplicate-admnum count instead of silently dropping") {
    val dups = CapstonePipeline.duplicateAdmnumCount(spark, s"$dataRoot/sas_data")
    // the committed fact kept ALL rows (3,096,313) despite duplicates
    assert(dups > 0)
    assert(golden("immigration.parquet").count() == 3096313L)
  }

  test("fixed mode diverges where documented: i94mode null-fill is 9") {
    val fixed = CapstonePipeline.immigrationFact(spark, s"$dataRoot/sas_data")
    assert(fixed.filter(col("i94mode") === 0).count() == 0)
    assert(fixed.filter(col("i94mode") === 9).count() >=
      golden("immigration.parquet").filter(col("i94mode") === 9).count() + 239)
  }
}
