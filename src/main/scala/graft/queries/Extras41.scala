package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 37: price-volume bridge decomposition and
  * rank correlations (Spearman, Kendall) — FP&A and robust-association
  * shapes whose arithmetic stays exact until the final division.
  */
object Extras41 extends QueryPack {

  /** Per-brand (exact revenue cents, volume) for one ship year. */
  private def yearly(s: SparkSession, dir: String) = {
    val t = Tables(s, dir)
    t("lineitem")
      .join(broadcast(t("part")), col("p_partkey") === col("l_partkey"))
      .filter(year(col("l_shipdate")).isin(1996, 1997))
      .groupBy(col("p_brand"), year(col("l_shipdate")).as("yr"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
        * 100 + 0.5)).as("rc"),
        sum(col("l_quantity")).as("q"))
  }

  /** Per-brand (exact avg price in cents, volume) across all years. */
  private def brandMetrics(s: SparkSession, dir: String) = {
    val t = Tables(s, dir)
    t("lineitem")
      .join(broadcast(t("part")), col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand")
      .agg((sum(floor(col("l_extendedprice") * 100 + 0.5))
        / sum(col("l_quantity"))).as("avg_price_c"),
        sum(col("l_quantity")).as("vol"))
  }

  // --------------------------------------------------------------- q271
  /** Price-volume bridge: each brand's year-over-year revenue change
    * decomposed into a volume effect ((q2-q1) at old price) and a
    * price effect ((p2-p1) on new volume) — the decomposition is exact
    * by construction (the two effects sum to the delta). */
  private def q271(s: SparkSession, dir: String): DataFrame = {
    val y = yearly(s, dir)
    val a = y.filter(col("yr") === 1996)
      .select(col("p_brand"), col("rc").as("rc1"), col("q").as("q1"))
    val b = y.filter(col("yr") === 1997)
      .select(col("p_brand").as("b2"), col("rc").as("rc2"),
        col("q").as("q2"))
    a.join(b, col("p_brand") === col("b2"))
      .select(col("p_brand"),
        round((col("rc2") - col("rc1")) / 100, 2).as("revenue_delta"),
        round((col("q2") - col("q1")) * (col("rc1") / col("q1")) / 100, 2)
          .as("volume_effect"),
        round((col("rc2") / col("q2") - col("rc1") / col("q1"))
          * col("q2") / 100, 2).as("price_effect"))
      .orderBy("p_brand")
  }

  private val q271Sql =
    """WITH yearly AS (
         SELECT p_brand, year(l_shipdate) AS yr,
                sum(floor(l_extendedprice * (1 - l_discount) * 100
                          + 0.5)) AS rc,
                sum(l_quantity) AS q
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE year(l_shipdate) IN (1996, 1997)
         GROUP BY 1, 2),
       wide AS (
         SELECT a.p_brand, a.rc AS rc1, a.q AS q1, b.rc AS rc2,
                b.q AS q2
         FROM yearly a JOIN yearly b
           ON a.p_brand = b.p_brand AND a.yr = 1996 AND b.yr = 1997)
       SELECT p_brand,
              round((rc2 - rc1) / 100, 2) AS revenue_delta,
              round((q2 - q1) * (rc1 / q1) / 100, 2) AS volume_effect,
              round((rc2 / q2 - rc1 / q1) * q2 / 100, 2) AS price_effect
       FROM wide ORDER BY p_brand"""

  // --------------------------------------------------------------- q272
  /** Spearman's rho between brand price level and volume, via the
    * closed form 1 - 6*sum(d^2)/(n(n^2-1)): ranks are deterministic
    * row_numbers over the 25-row reduce, the statistic is exact
    * integer arithmetic until the one division. */
  private def q272(s: SparkSession, dir: String): DataFrame = {
    val per = brandMetrics(s, dir)
    val ranked = per.select(
      row_number().over(Window.orderBy(col("avg_price_c"), col("p_brand")))
        .as("rp"),
      row_number().over(Window.orderBy(col("vol"), col("p_brand")))
        .as("rv"))
    ranked.agg(count(lit(1)).as("n"),
        round(lit(1) - lit(6.0)
          * sum((col("rp") - col("rv")) * (col("rp") - col("rv")))
          / (count(lit(1)) * (count(lit(1)) * count(lit(1)) - 1)), 6)
          .as("spearman_rho"))
  }

  private val q272Sql =
    """WITH per AS (
         SELECT p_brand,
                sum(floor(l_extendedprice * 100 + 0.5)) / sum(l_quantity)
                  AS avg_price_c,
                sum(l_quantity) AS vol
         FROM lineitem JOIN part ON p_partkey = l_partkey
         GROUP BY 1),
       ranked AS (
         SELECT row_number() OVER (ORDER BY avg_price_c, p_brand) AS rp,
                row_number() OVER (ORDER BY vol, p_brand) AS rv
         FROM per)
       SELECT CAST(count(*) AS BIGINT) AS n,
              round(1 - 6.0 * sum((rp - rv) * (rp - rv))
                        / (count(*) * (count(*) * count(*) - 1)), 6)
                AS spearman_rho
       FROM ranked"""

  // --------------------------------------------------------------- q273
  /** Kendall tau-a over the same two metrics: concordant-minus-
    * discordant over all brand pairs. The pair join is a designed
    * small-domain product (25 rows -> 300 pairs); the sign arithmetic
    * is exact. */
  private def q273(s: SparkSession, dir: String): DataFrame = {
    val per = brandMetrics(s, dir)
    val a = per.select(col("p_brand").as("ba"),
      col("avg_price_c").as("pa"), col("vol").as("va"))
    val b = per.select(col("p_brand").as("bb"),
      col("avg_price_c").as("pb"), col("vol").as("vb"))
    val sgn = (col("pa") - col("pb")) * (col("va") - col("vb"))
    a.join(broadcast(b), col("ba") < col("bb"))
      .select(when(sgn > 0, 1L).when(sgn < 0, -1L).otherwise(0L).as("s"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum(col("s")) / count(lit(1)).cast("double"), 6)
          .as("kendall_tau"))
  }

  private val q273Sql =
    """WITH per AS (
         SELECT p_brand,
                sum(floor(l_extendedprice * 100 + 0.5)) / sum(l_quantity)
                  AS avg_price_c,
                sum(l_quantity) AS vol
         FROM lineitem JOIN part ON p_partkey = l_partkey
         GROUP BY 1),
       pairs AS (
         SELECT CASE WHEN (a.avg_price_c - b.avg_price_c)
                          * (a.vol - b.vol) > 0 THEN 1
                     WHEN (a.avg_price_c - b.avg_price_c)
                          * (a.vol - b.vol) < 0 THEN -1
                     ELSE 0 END AS s
         FROM per a JOIN per b ON a.p_brand < b.p_brand),
       tot AS (SELECT count(*) AS np, sum(s) AS net FROM pairs)
       SELECT CAST(np AS BIGINT) AS n_pairs,
              round(net / np::DOUBLE, 6) AS kendall_tau
       FROM tot"""

  override def queries: Map[String, QueryFn] = Map(
    "q271_price_volume_bridge" -> q271 _,
    "q272_spearman"            -> q272 _,
    "q273_kendall"             -> q273 _)

  override def oracles: Map[String, String] = Map(
    "q271_price_volume_bridge" -> q271Sql,
    "q272_spearman"            -> q272Sql,
    "q273_kendall"             -> q273Sql)
}
