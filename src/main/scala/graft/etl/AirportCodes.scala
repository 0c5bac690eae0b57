package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Airport-codes ingestion — the reference's fourth supplementary
  * dataset (`spark.read.csv('data/airport-codes_csv.csv', sep=',',
  * inferSchema=True, header=True)`, notebook cell 28; column dictionary
  * in cell 6). The reference only explores the table (printSchema/show);
  * the file itself is a stripped large blob in the mirror, so the
  * committed deterministic stand-in at fixtures/airport_codes.csv
  * carries the same 12-column header, RFC-4180 quoting (names and
  * "lon, lat" coordinates contain commas), empty-string nulls, and
  * mixed-sign elevations.
  */
object AirportCodes {

  val fixturePath = "/root/repo/fixtures/airport_codes.csv"

  /** Reference-shaped read: comma-delimited, header, inferSchema (S5
    * reader family — ident/type/name/... strings, elevation_ft int). */
  def read(spark: SparkSession, path: String = fixturePath): DataFrame =
    spark.read
      .option("sep", ",")
      .option("header", "true")
      .option("inferSchema", "true")
      .csv(path)

  /** Modeled airport dimension the reference stops short of: coordinates
    * split into typed lon/lat, a has_iata service flag — the columns an
    * immigration `i94port` enrichment join would want. Row-local
    * projection only: at scale this is a narrow map over the raw scan,
    * no shuffle. */
  def airportDim(raw: DataFrame): DataFrame =
    raw.select(
      col("ident"), col("type"), col("name"),
      col("elevation_ft").cast("int").as("elevation_ft"),
      col("iso_country"), col("iso_region"), col("municipality"),
      col("iata_code"),
      col("iata_code").isNotNull.as("has_iata"),
      split(col("coordinates"), ",\\s*").getItem(0).cast("double").as("lon"),
      split(col("coordinates"), ",\\s*").getItem(1).cast("double").as("lat"))
}
