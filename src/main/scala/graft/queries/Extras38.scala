package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 34: hierarchical shares, Lorenz deciles,
  * newcomer revenue split.
  */
object Extras38 extends QueryPack {

  private def cents(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5)

  // --------------------------------------------------------------- q262
  /** Percent-of-parent at two levels: each nation's revenue as a share
    * of its region and of the total — two window normalizations over
    * the 25-row reduce (the windows never see raw orders). */
  private def q262(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val rev = t("orders")
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(sum(cents(col("o_totalprice"))).as("cents"))
    val byRegion = Window.partitionBy("region")
    val overall = Window.partitionBy()
    rev.select(col("region"), col("nation"),
        round(col("cents") / 100, 2).as("revenue"),
        round(col("cents") / sum(col("cents")).over(byRegion), 6)
          .as("share_of_region"),
        round(col("cents") / sum(col("cents")).over(overall), 6)
          .as("share_of_total"))
      .orderBy("region", "nation")
  }

  private val q262Sql =
    """WITH rev AS (
         SELECT r_name AS region, n_name AS nation,
                sum(floor(o_totalprice * 100 + 0.5)) AS cents
         FROM orders
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY 1, 2)
       SELECT region, nation,
              round(cents / 100, 2) AS revenue,
              round(cents / sum(cents) OVER (PARTITION BY region), 6)
                AS share_of_region,
              round(cents / sum(cents) OVER (), 6) AS share_of_total
       FROM rev ORDER BY region, nation"""

  // --------------------------------------------------------------- q263
  /** Lorenz curve sampled at customer revenue deciles: ntile the
    * customer reduce on a total order, then cumulative decile shares —
    * the inequality visual behind the q149 Gini number. */
  private def q263(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val cust = o.groupBy("o_custkey")
      .agg(sum(cents(col("o_totalprice"))).as("cents"))
    val tiled = cust.withColumn("decile",
      ntile(10).over(Window.orderBy(col("cents"), col("o_custkey"))))
    val per = tiled.groupBy("decile")
      .agg(sum(col("cents")).as("dc"), count(lit(1)).as("n_customers"))
    val cum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    per.select(col("decile"), col("n_customers"),
        round(sum(col("dc")).over(cum) / sum(col("dc")).over(all), 6)
          .as("cum_revenue_share"))
      .orderBy("decile")
  }

  private val q263Sql =
    """WITH cust AS (
         SELECT o_custkey, sum(floor(o_totalprice * 100 + 0.5)) AS cents
         FROM orders GROUP BY 1),
       tiled AS (
         SELECT cents,
                ntile(10) OVER (ORDER BY cents, o_custkey) AS decile
         FROM cust),
       per AS (
         SELECT decile, sum(cents) AS dc, count(*) AS n
         FROM tiled GROUP BY 1)
       SELECT decile, CAST(n AS BIGINT) AS n_customers,
              round(sum(dc) OVER (ORDER BY decile
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    / sum(dc) OVER (), 6) AS cum_revenue_share
       FROM per ORDER BY decile"""

  // --------------------------------------------------------------- q264
  /** Newcomer revenue split: each year's revenue share from customers
    * whose FIRST order falls in that year — growth quality in one
    * column. The first-year reduce joins back on the customer key the
    * orders already carry. */
  private def q264(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val firsty = o.groupBy(col("o_custkey").as("fc"))
      .agg(min(year(col("o_orderdate"))).as("fy"))
    val isNew = year(col("o_orderdate")) === col("fy")
    o.join(firsty, col("o_custkey") === col("fc"))
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(round(sum(when(isNew, cents(col("o_totalprice"))).otherwise(0L))
          / sum(cents(col("o_totalprice"))), 6).as("newcomer_share"),
        countDistinct(when(isNew, col("o_custkey")))
          .as("n_new_customers"))
      .orderBy("yr")
  }

  private val q264Sql =
    """WITH firsty AS (
         SELECT o_custkey, min(year(o_orderdate)) AS fy
         FROM orders GROUP BY 1)
       SELECT year(o_orderdate) AS yr,
              round(sum(CASE WHEN year(o_orderdate) = fy
                        THEN floor(o_totalprice * 100 + 0.5) ELSE 0 END)
                    / sum(floor(o_totalprice * 100 + 0.5)), 6)
                AS newcomer_share,
              CAST(count(DISTINCT CASE WHEN year(o_orderdate) = fy
                         THEN o.o_custkey END) AS BIGINT)
                AS n_new_customers
       FROM orders o JOIN firsty f ON o.o_custkey = f.o_custkey
       GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q262_hierarchy_share" -> q262 _,
    "q263_lorenz"          -> q263 _,
    "q264_newcomer_share"  -> q264 _)

  override def oracles: Map[String, String] = Map(
    "q262_hierarchy_share" -> q262Sql,
    "q263_lorenz"          -> q263Sql,
    "q264_newcomer_share"  -> q264Sql)
}
