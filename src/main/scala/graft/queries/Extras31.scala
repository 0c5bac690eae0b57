package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 27: seasonality, brand-share trends, and
  * customer brand-loyalty concentration.
  */
object Extras31 extends QueryPack {

  // --------------------------------------------------------------- q224
  /** Holiday-season uplift: Nov-Dec average DAILY revenue vs the rest
    * of the year, per order priority — two conditional aggregates off
    * one scan, normalized by day counts (61 vs 304) so the ratio is a
    * rate comparison, not a volume one. */
  private def q224(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    o.withColumn("hol", month(col("o_orderdate")).isin(11, 12))
      .groupBy("o_orderpriority")
      .agg(
        round(sum(when(col("hol"), col("o_totalprice"))) / 61, 2)
          .as("holiday_daily_rev"),
        round(sum(when(!col("hol"), col("o_totalprice"))) / 304, 2)
          .as("rest_daily_rev"),
        round((sum(when(col("hol"), col("o_totalprice"))) / 61) /
              (sum(when(!col("hol"), col("o_totalprice"))) / 304), 6)
          .as("uplift"))
      .orderBy("o_orderpriority")
  }

  private val q224Sql =
    """SELECT o_orderpriority,
              round(sum(CASE WHEN hol THEN o_totalprice END) / 61, 2)
                AS holiday_daily_rev,
              round(sum(CASE WHEN NOT hol THEN o_totalprice END) / 304, 2)
                AS rest_daily_rev,
              round((sum(CASE WHEN hol THEN o_totalprice END) / 61)
                    / (sum(CASE WHEN NOT hol THEN o_totalprice END) / 304), 6)
                AS uplift
       FROM (SELECT o_orderpriority, o_totalprice,
                    month(o_orderdate) IN (11, 12) AS hol
             FROM orders) x
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q225
  /** Leading-brand share per year: which brand wins each year and with
    * what revenue share — max_by over the (year, brand) reduce plus a
    * within-year total window; the part dim broadcasts into the fact
    * join. */
  private def q225(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val rev = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t("part")), col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("o_orderdate")).as("yr"), col("p_brand"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("rev"))
    val wYr = Window.partitionBy("yr")
    rev
      .withColumn("share", col("rev") / sum("rev").over(wYr))
      .withColumn("rk", row_number().over(
        Window.partitionBy("yr").orderBy(desc("rev"), col("p_brand"))))
      .filter(col("rk") === 1)
      .select(col("yr"), col("p_brand").as("top_brand"),
        round(col("share"), 6).as("share"))
      .orderBy("yr")
  }

  private val q225Sql =
    """WITH rev AS (
         SELECT year(o_orderdate) AS yr, p_brand,
                sum(l_extendedprice * (1 - l_discount)) AS rev
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey
         GROUP BY 1, 2),
       sh AS (
         SELECT yr, p_brand,
                rev / sum(rev) OVER (PARTITION BY yr) AS share,
                row_number() OVER (PARTITION BY yr
                                   ORDER BY rev DESC, p_brand) AS rk
         FROM rev)
       SELECT yr, p_brand AS top_brand, round(share, 6) AS share
       FROM sh WHERE rk = 1 ORDER BY yr"""

  // --------------------------------------------------------------- q226
  /** Brand-loyalty distribution: per-customer Herfindahl index over
    * brand spend (1.0 = single-brand loyalist), bucketed to a
    * histogram. Two reduces of shrinking grain — (customer, brand)
    * then customer — and a per-customer window between them. */
  private def q226(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val cb = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(t("part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("o_custkey"), col("p_brand"))
      .agg(sum(col("l_extendedprice")).as("rev"))
    val wCust = Window.partitionBy("o_custkey")
    val hhi = cb
      .withColumn("share", col("rev") / sum("rev").over(wCust))
      .groupBy("o_custkey")
      .agg(sum(col("share") * col("share")).as("hhi"))
    hhi.groupBy(floor(col("hhi") * 10).cast("int").as("hhi_decile"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("hhi_decile")
  }

  private val q226Sql =
    """WITH cb AS (
         SELECT o_custkey, p_brand, sum(l_extendedprice) AS rev
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN part ON l_partkey = p_partkey
         GROUP BY 1, 2),
       hhi AS (
         SELECT o_custkey,
                sum(share * share) AS hhi
         FROM (SELECT o_custkey,
                      rev / sum(rev) OVER (PARTITION BY o_custkey) AS share
               FROM cb) s
         GROUP BY 1)
       SELECT CAST(floor(hhi * 10) AS INT) AS hhi_decile,
              count(*) AS n_customers
       FROM hhi GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q224_holiday_uplift" -> q224 _,
    "q225_top_brand"      -> q225 _,
    "q226_brand_loyalty"  -> q226 _)

  override def oracles: Map[String, String] = Map(
    "q224_holiday_uplift" -> q224Sql,
    "q225_top_brand"      -> q225Sql,
    "q226_brand_loyalty"  -> q226Sql)
}
