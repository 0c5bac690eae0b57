package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 38: customer-lifetime analytics — cohort LTV
  * accumulation, the repeat-purchase ladder, and the distribution of
  * per-customer value trends.
  */
object Extras42 extends QueryPack {

  private def cents(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5)

  /** Per-customer order sequence numbers (deterministic tie-break). */
  private def sequenced(s: SparkSession, dir: String) =
    Tables(s, dir)("orders").withColumn("n",
      row_number().over(Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")))

  // --------------------------------------------------------------- q274
  /** Cohort LTV curves: cumulative revenue per signup-year cohort by
    * age-in-years — the running window covers the (cohort, age)
    * reduce, never raw orders. */
  private def q274(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val firsty = o.groupBy(col("o_custkey").as("fc"))
      .agg(min(year(col("o_orderdate"))).as("cohort"))
    val rev = o.join(firsty, col("o_custkey") === col("fc"))
      .groupBy(col("cohort"),
        (year(col("o_orderdate")) - col("cohort")).as("age"))
      .agg(sum(cents(col("o_totalprice"))).as("rc"))
    val cum = Window.partitionBy("cohort").orderBy("age")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev.filter(col("cohort") <= 1998)
      .select(col("cohort"), col("age"),
        round(sum(col("rc")).over(cum) / 100, 2).as("cum_revenue"))
      .orderBy("cohort", "age")
  }

  private val q274Sql =
    """WITH firsty AS (
         SELECT o_custkey, min(year(o_orderdate)) AS cohort
         FROM orders GROUP BY 1),
       rev AS (
         SELECT f.cohort, year(o.o_orderdate) - f.cohort AS age,
                sum(floor(o.o_totalprice * 100 + 0.5)) AS rc
         FROM orders o JOIN firsty f ON o.o_custkey = f.o_custkey
         GROUP BY 1, 2)
       SELECT cohort, age,
              round(sum(rc) OVER (PARTITION BY cohort ORDER BY age
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    / 100, 2) AS cum_revenue
       FROM rev WHERE cohort <= 1998 ORDER BY cohort, age"""

  // --------------------------------------------------------------- q275
  /** Repeat-purchase ladder: how many customers reach their nth order,
    * and the conditional probability of an (n+1)th — the loyalty
    * funnel from one user-keyed window plus a 12-row lead. */
  private def q275(s: SparkSession, dir: String): DataFrame = {
    val ladder = sequenced(s, dir)
      .filter(col("n") <= 12)
      .groupBy("n")
      .agg(count(lit(1)).as("customers_with_n"))
    ladder.withColumn("p_next",
        round(lead(col("customers_with_n"), 1).over(Window.orderBy("n"))
          / col("customers_with_n").cast("double"), 6))
      .orderBy("n")
  }

  private val q275Sql =
    """WITH ranked AS (
         SELECT o_custkey,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS n
         FROM orders),
       ladder AS (
         SELECT n, count(*) AS customers_with_n
         FROM ranked WHERE n <= 12 GROUP BY n)
       SELECT n, CAST(customers_with_n AS BIGINT) AS customers_with_n,
              round(lead(customers_with_n) OVER (ORDER BY n)
                    / customers_with_n::DOUBLE, 6) AS p_next
       FROM ladder ORDER BY n"""

  // --------------------------------------------------------------- q276
  /** Value-trend distribution: regression slope of order value over
    * each customer's order sequence (>=3 orders), summarized as slope
    * quartiles — are customers spending more or less as they mature?
    * Two-level reduce: per-customer regression, then an ordered-set
    * percentile over the 1-row-per-customer slopes. */
  private def q276(s: SparkSession, dir: String): DataFrame = {
    val slopes = sequenced(s, dir)
      .withColumn("c", cents(col("o_totalprice")))
      .groupBy("o_custkey")
      .agg(regr_slope(col("c"), col("n")).as("sl"),
        count(lit(1)).as("cnt"))
      .filter(col("cnt") >= 3)
    slopes.agg(count(lit(1)).as("n_customers"),
      round(expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY sl)") / 100,
        4).as("p25_slope"),
      round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY sl)") / 100,
        4).as("median_slope"),
      round(expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY sl)") / 100,
        4).as("p75_slope"))
  }

  private val q276Sql =
    """WITH seq AS (
         SELECT o_custkey,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate, o_orderkey) AS n,
                floor(o_totalprice * 100 + 0.5) AS c
         FROM orders),
       slopes AS (
         SELECT o_custkey, regr_slope(c, n) AS sl
         FROM seq GROUP BY 1 HAVING count(*) >= 3)
       SELECT CAST(count(*) AS BIGINT) AS n_customers,
              round(percentile_cont(0.25) WITHIN GROUP (ORDER BY sl)
                    / 100, 4) AS p25_slope,
              round(percentile_cont(0.5) WITHIN GROUP (ORDER BY sl)
                    / 100, 4) AS median_slope,
              round(percentile_cont(0.75) WITHIN GROUP (ORDER BY sl)
                    / 100, 4) AS p75_slope
       FROM slopes"""

  override def queries: Map[String, QueryFn] = Map(
    "q274_ltv_curve"     -> q274 _,
    "q275_repeat_ladder" -> q275 _,
    "q276_value_trend"   -> q276 _)

  override def oracles: Map[String, String] = Map(
    "q274_ltv_curve"     -> q274Sql,
    "q275_repeat_ladder" -> q275Sql,
    "q276_value_trend"   -> q276Sql)
}
