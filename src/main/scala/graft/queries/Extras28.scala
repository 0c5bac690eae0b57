package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 24: operational reliability metrics, share
  * drift, relational division, and churn-gap detection.
  */
object Extras28 extends QueryPack {

  // --------------------------------------------------------------- q214
  /** Supplier lead-time reliability: mean and stddev of order→ship
    * latency per supplier, 10 most erratic — the vendor scorecard.
    * One co-partitioned fact-fact join, one supplier-grain moment
    * aggregate (mergeable, map-side combined). */
  private def q214(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t("lineitem").join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("lat",
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"),
           round(avg("lat"), 4).as("mean_days"),
           round(stddev_samp(col("lat")), 4).as("sd_days"))
      .filter(col("n") >= 20)
      .orderBy(desc("sd_days"), col("l_suppkey"))
      .limit(10)
  }

  private val q214Sql =
    """SELECT l_suppkey, count(*) AS n,
              round(avg(lat), 4) AS mean_days,
              round(stddev_samp(lat), 4) AS sd_days
       FROM (SELECT l_suppkey,
                    datediff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE)) AS lat
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey) x
       GROUP BY 1 HAVING count(*) >= 20
       ORDER BY sd_days DESC, l_suppkey LIMIT 10"""

  // --------------------------------------------------------------- q215
  /** Revenue-share drift: each nation's share of yearly revenue and its
    * change vs the prior year — the market-share trend table. Shares
    * normalize within year (window over the year×nation reduce); the
    * drift is one lag over the same reduce. */
  private def q215(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val rev = t("orders").join(t("customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(year(col("o_orderdate")).as("yr"),
        col("c_nationkey").as("nation"))
      .agg(sum(col("o_totalprice")).as("rev"))
    val wYear = Window.partitionBy("yr")
    val wLag = Window.partitionBy("nation").orderBy("yr")
    rev
      .withColumn("share", col("rev") / sum("rev").over(wYear))
      .withColumn("drift",
        round(col("share") - lag(col("share"), 1).over(wLag), 6))
      .select(col("yr"), col("nation"), round(col("share"), 6).as("share"),
        col("drift"))
      .filter(col("nation") < 5)
      .orderBy("nation", "yr")
  }

  private val q215Sql =
    """WITH rev AS (
         SELECT year(o_orderdate) AS yr, c_nationkey AS nation,
                sum(o_totalprice) AS rev
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2),
       sh AS (
         SELECT yr, nation,
                rev / sum(rev) OVER (PARTITION BY yr) AS share
         FROM rev)
       SELECT yr, nation, round(share, 6) AS share,
              round(share - lag(share) OVER (PARTITION BY nation
                                             ORDER BY yr), 6) AS drift
       FROM sh WHERE nation < 5 ORDER BY nation, yr"""

  // --------------------------------------------------------------- q216
  /** Relational division: customers who ordered in BOTH 1996 and 1997
    * — the "for all" query, expressed as distinct-count equality
    * rather than nested NOT EXISTS (one reduce instead of a correlated
    * double anti-join). The divisor is a two-element set so the result
    * is non-empty even at the smallest scale factor. */
  private def q216(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    o.filter(year(col("o_orderdate")).isin(1996, 1997))
      .groupBy("o_custkey")
      .agg(count_distinct(year(col("o_orderdate"))).as("ny"),
           count(lit(1)).as("n_orders"))
      .filter(col("ny") === 2)
      .select(col("o_custkey"), col("n_orders"))
      .orderBy("o_custkey")
  }

  private val q216Sql =
    """SELECT o_custkey, count(*) AS n_orders
       FROM orders WHERE year(o_orderdate) IN (1996, 1997)
       GROUP BY 1
       HAVING count(DISTINCT year(o_orderdate)) = 2
       ORDER BY 1"""

  // --------------------------------------------------------------- q217
  /** Churn-gap detection: orders followed by ≥180 days of customer
    * silence (or nothing at all) — the churn-trigger event list, from
    * one lead() pass over the customer-keyed order stream. */
  private def q217(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
      .withColumn("next_d", lead(col("o_orderdate"), 1).over(w))
      .withColumn("gap", datediff(to_date(col("next_d")),
        to_date(col("o_orderdate"))))
      .filter(col("gap").isNull || col("gap") >= 180)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(count(lit(1)).as("n_churn_events"),
           sum(when(col("gap").isNull, 1).otherwise(0)).as("n_final_orders"))
      .orderBy("yr")
  }

  private val q217Sql =
    """WITH g AS (
         SELECT o_custkey, o_orderdate,
                datediff('day', CAST(o_orderdate AS DATE),
                  CAST(lead(o_orderdate) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS DATE)) AS gap
         FROM orders)
       SELECT year(o_orderdate) AS yr, count(*) AS n_churn_events,
              CAST(sum(CASE WHEN gap IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS n_final_orders
       FROM g WHERE gap IS NULL OR gap >= 180
       GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q214_leadtime_variance" -> q214 _,
    "q215_share_drift"       -> q215 _,
    "q216_division"          -> q216 _,
    "q217_churn_gaps"        -> q217 _)

  override def oracles: Map[String, String] = Map(
    "q214_leadtime_variance" -> q214Sql,
    "q215_share_drift"       -> q215Sql,
    "q216_division"          -> q216Sql,
    "q217_churn_gaps"        -> q217Sql)
}
