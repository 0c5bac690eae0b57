package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 32: time-series diagnostics — max drawdown,
  * lag-1 autocorrelation, CUSUM change detection, Fano-factor
  * burstiness. All series reduce to their (group, day/month) grain
  * FIRST, so the ordered windows run over calendar-bounded series, not
  * raw facts.
  */
object Extras36 extends QueryPack {

  private def cents(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5)

  // --------------------------------------------------------------- q255
  /** Max drawdown of the daily-revenue series per priority: running
    * peak (a value-monotone window) then the worst peak-relative dip —
    * the risk metric, on exact-cents dailies. */
  private def q255(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val daily = o.groupBy(col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("d"))
      .agg(sum(cents(col("o_totalprice"))).as("cents"))
    val w = Window.partitionBy("prio").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("peak", max(col("cents")).over(w))
      .groupBy("prio")
      .agg(round(max(lit(1) - col("cents") / col("peak").cast("double")), 6)
        .as("max_drawdown"),
        count(lit(1)).as("n_days"))
      .orderBy("prio")
  }

  private val q255Sql =
    """WITH daily AS (
         SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
                sum(floor(o_totalprice * 100 + 0.5)) AS cents
         FROM orders GROUP BY 1, 2),
       runmax AS (
         SELECT prio, d, cents,
                max(cents) OVER (PARTITION BY prio ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS peak
         FROM daily)
       SELECT prio, round(max(1 - cents / peak::DOUBLE), 6)
                AS max_drawdown,
              CAST(count(*) AS BIGINT) AS n_days
       FROM runmax GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q256
  /** Lag-1 autocorrelation of monthly revenue: one lag window over the
    * 80-row monthly reduce, then a single corr aggregate — seasonality
    * vs mean-reversion in one number. */
  private def q256(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val monthly = o.groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(sum(cents(col("o_totalprice"))).as("cents"))
    val w = Window.orderBy("m")
    monthly.withColumn("prev", lag(col("cents"), 1).over(w))
      .filter(col("prev").isNotNull)
      .agg(round(corr(col("cents"), col("prev")), 6).as("lag1_autocorr"),
        count(lit(1)).as("n_pairs"))
  }

  private val q256Sql =
    """WITH monthly AS (
         SELECT date_trunc('month', o_orderdate) AS m,
                sum(floor(o_totalprice * 100 + 0.5)) AS cents
         FROM orders GROUP BY 1),
       paired AS (
         SELECT cents, lag(cents) OVER (ORDER BY m) AS prev
         FROM monthly)
       SELECT round(corr(cents, prev), 6) AS lag1_autocorr,
              CAST(count(*) AS BIGINT) AS n_pairs
       FROM paired WHERE prev IS NOT NULL"""

  // --------------------------------------------------------------- q257
  /** CUSUM change detection per event type: cumulative deviation from
    * the type's mean daily count, reporting the worst excursion and the
    * day it peaks (earliest on ties). The running sum is sequential in
    * day order, so both engines accumulate identical doubles. */
  private def q257(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val daily = e.groupBy(col("event_type").as("t"),
        to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    val means = daily.groupBy("t").agg(avg(col("n")).as("mu"))
    val run = Window.partitionBy("t").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("t")
    daily.join(broadcast(means), "t")
      .withColumn("s", sum(col("n") - col("mu")).over(run))
      .withColumn("a", abs(col("s")))
      .withColumn("ma", max(col("a")).over(whole))
      .groupBy("t")
      .agg(round(max(col("a")), 4).as("max_cusum"),
        min(when(col("a") === col("ma"), col("d"))).as("change_day"))
      .orderBy("t")
  }

  private val q257Sql =
    """WITH daily AS (
         SELECT event_type AS t, CAST(ts AS DATE) AS d, count(*) AS n
         FROM events GROUP BY 1, 2),
       means AS (SELECT t, avg(n) AS mu FROM daily GROUP BY 1),
       cusum AS (
         SELECT daily.t, d,
                sum(n - mu) OVER (PARTITION BY daily.t ORDER BY d
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
         FROM daily JOIN means ON daily.t = means.t),
       mx AS (
         SELECT t, d, abs(s) AS a,
                max(abs(s)) OVER (PARTITION BY t) AS ma
         FROM cusum)
       SELECT t, round(max(a), 4) AS max_cusum,
              min(CASE WHEN a = ma THEN d END) AS change_day
       FROM mx GROUP BY t ORDER BY t"""

  // --------------------------------------------------------------- q258
  /** Burstiness: the Fano factor (variance-to-mean ratio) of daily
    * event counts — 1.0 for Poisson arrivals, above it for bursts. */
  private def q258(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val daily = e.groupBy(col("event_type").as("t"),
        to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    daily.groupBy("t")
      .agg(count(lit(1)).as("n_days"),
        round(var_samp(col("n")) / avg(col("n")), 6).as("fano"))
      .orderBy("t")
  }

  private val q258Sql =
    """WITH daily AS (
         SELECT event_type AS t, CAST(ts AS DATE) AS d, count(*) AS n
         FROM events GROUP BY 1, 2)
       SELECT t, CAST(count(*) AS BIGINT) AS n_days,
              round(var_samp(n) / avg(n), 6) AS fano
       FROM daily GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q255_drawdown" -> q255 _,
    "q256_autocorr" -> q256 _,
    "q257_cusum"    -> q257 _,
    "q258_fano"     -> q258 _)

  override def oracles: Map[String, String] = Map(
    "q255_drawdown" -> q255Sql,
    "q256_autocorr" -> q256Sql,
    "q257_cusum"    -> q257Sql,
    "q258_fano"     -> q258Sql)
}
