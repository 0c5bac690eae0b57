package graft.etl

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType}

import graft.GraftTestBase

/** Airport-codes ingestion (reference notebook cell 28 read shape) over
  * the committed deterministic fixture. */
class AirportCodesSpec extends GraftTestBase {

  private lazy val raw = AirportCodes.read(spark)
  private lazy val dim = AirportCodes.airportDim(raw)

  test("inferSchema lands the reference's column dictionary") {
    val f = raw.schema.fields.map(x => x.name -> x.dataType).toMap
    assert(raw.schema.fieldNames.toSeq == Seq("ident", "type", "name",
      "elevation_ft", "continent", "iso_country", "iso_region",
      "municipality", "gps_code", "iata_code", "local_code", "coordinates"))
    assert(f("elevation_ft") == IntegerType) // numeric inference
    assert(f("coordinates") == StringType)   // "lon, lat" stays a string
  }

  test("RFC-4180 quoting survives: comma-bearing names parse as one field") {
    assert(raw.count() == 180)
    assert(raw.filter(col("name").contains("Intl, Terminal")).count() > 0)
  }

  test("empty CSV fields are nulls, not empty strings") {
    assert(raw.filter(col("elevation_ft").isNull).count() > 0)
    assert(raw.filter(col("iata_code") === "").count() == 0)
  }

  test("dim splits coordinates into typed lon/lat in range") {
    val d = dim.agg(
      min(col("lon")), max(col("lon")), min(col("lat")), max(col("lat")),
      sum(col("has_iata").cast("long"))).head()
    assert(d.getDouble(0) >= -180 && d.getDouble(1) <= 180)
    assert(d.getDouble(2) >= -90 && d.getDouble(3) <= 90)
    assert(d.getLong(4) > 0 && d.getLong(4) < 180) // both flag values occur
    assert(dim.schema("lon").dataType == DoubleType)
  }
}
