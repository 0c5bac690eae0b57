package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.AirportCodes

/** Airport-codes coverage — the last reference entity without engine
  * presence (notebook cells 6/28: CSV read + schema exploration; the
  * raw file is a stripped blob, so the committed deterministic fixture
  * stands in — see [[graft.etl.AirportCodes]]). The query models the
  * profile the reference's exploration stops short of, through the
  * typed airportDim projection.
  */
object Airports extends QueryPack {

  // --------------------------------------------------------------- q347
  /** Per (iso_country, type) airport profile over the typed dim:
    * counts, IATA-serviced counts, elevation stats. Elevations are
    * integers, so sums/averages are exact in double and the compare is
    * bit-stable; all aggregates run in one hash-agg pass. */
  private def q347(s: SparkSession, dir: String): DataFrame =
    AirportCodes.airportDim(AirportCodes.read(s))
      .groupBy(col("iso_country"), col("type"))
      .agg(
        count(lit(1)).as("n_airports"),
        sum(col("has_iata").cast("long")).as("n_iata"),
        round(avg(col("elevation_ft")), 2).as("avg_elev_ft"),
        max(col("elevation_ft")).cast("long").as("max_elev_ft"))
      .orderBy(col("iso_country"), col("type"))

  private val q347Sql =
    s"""SELECT iso_country, type,
       count(*) AS n_airports,
       CAST(sum(CASE WHEN iata_code IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_iata,
       round(avg(elevation_ft), 2) AS avg_elev_ft,
       CAST(max(elevation_ft) AS BIGINT) AS max_elev_ft
       FROM read_csv('${AirportCodes.fixturePath}', header=true)
       GROUP BY iso_country, type
       ORDER BY iso_country, type"""

  override val queries: Map[String, QueryFn] = Map(
    "q347_airport_codes" -> q347 _)

  override val oracles: Map[String, String] = Map(
    "q347_airport_codes" -> q347Sql)
}
