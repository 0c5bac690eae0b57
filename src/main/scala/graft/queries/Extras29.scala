package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 25: independence testing, trailing-window
  * anomaly detection, and session-depth engagement curves.
  */
object Extras29 extends QueryPack {

  // --------------------------------------------------------------- q218
  /** Chi-square statistic for status × priority independence: observed
    * vs expected cell counts from the two marginals — computed entirely
    * from ONE contingency reduce (the marginals are windows over the
    * 15-cell table, never a second scan). */
  private def q218(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val cells = o.groupBy("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).cast("double").as("obs"))
    val wRow = Window.partitionBy("o_orderstatus")
    val wCol = Window.partitionBy("o_orderpriority")
    val wAll = Window.partitionBy()
    cells
      .withColumn("exp",
        sum("obs").over(wRow) * sum("obs").over(wCol) / sum("obs").over(wAll))
      .agg(round(sum((col("obs") - col("exp")) * (col("obs") - col("exp"))
          / col("exp")), 6).as("chi2"),
        count(lit(1)).as("n_cells"))
  }

  private val q218Sql =
    """WITH cells AS (
         SELECT o_orderstatus, o_orderpriority,
                count(*)::DOUBLE AS obs
         FROM orders GROUP BY 1, 2),
       e AS (
         SELECT obs,
                sum(obs) OVER (PARTITION BY o_orderstatus)
                  * sum(obs) OVER (PARTITION BY o_orderpriority)
                  / sum(obs) OVER () AS exp
         FROM cells)
       SELECT round(sum((obs - exp) * (obs - exp) / exp), 6) AS chi2,
              count(*) AS n_cells
       FROM e"""

  // --------------------------------------------------------------- q219
  /** Trailing-window anomaly detection: daily revenue flagged when it
    * exceeds the trailing 30-day mean by 2 trailing standard
    * deviations. The windows run over the ~2.4k-row day series (the
    * reduce), with rows-framed trailing stats excluding the current
    * day. */
  private def q219(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    // exact integer-cents daily totals: the trailing mean is then the
    // same double in every engine (sum-of-longs / n), so the 2-sigma
    // boundary can't flip on summation-order ULPs (q204's money rule)
    val daily = o.groupBy(to_date(col("o_orderdate")).as("d"))
      .agg((sum(floor(col("o_totalprice") * 100 + 0.5)) / 100).as("rev"))
    val w = Window.orderBy("d").rowsBetween(-30, -1)
    daily
      .withColumn("mu", avg("rev").over(w))
      .withColumn("sd", stddev_samp(col("rev")).over(w))
      .withColumn("n_prior", count(lit(1)).over(w))
      .filter(col("n_prior") === 30 &&
        col("rev") > col("mu") + lit(2) * col("sd"))
      // rev is exact; mu itself is NOT emitted - sum/30 lands exactly on
      // half-cent boundaries where cross-engine ULPs flip round(mu, 2).
      // z's rounding granularity (0.01 of a sigma) is ~1e7 ULPs wide.
      .select(col("d"), round(col("rev"), 2).as("rev"),
        round((col("rev") - col("mu")) / col("sd"), 2).as("z"))
      .orderBy("d")
  }

  private val q219Sql =
    """WITH daily AS (
         SELECT CAST(o_orderdate AS DATE) AS d,
                sum(floor(o_totalprice * 100 + 0.5)) / 100 AS rev
         FROM orders GROUP BY 1),
       t AS (
         SELECT d, rev,
                avg(rev) OVER w AS mu,
                stddev_samp(rev) OVER w AS sd,
                count(*) OVER w AS n_prior
         FROM daily
         WINDOW w AS (ORDER BY d ROWS BETWEEN 30 PRECEDING AND 1 PRECEDING))
       SELECT d, round(rev, 2) AS rev,
              round((rev - mu) / sd, 2) AS z
       FROM t WHERE n_prior = 30 AND rev > mu + 2 * sd
       ORDER BY d"""

  // --------------------------------------------------------------- q220
  /** Session-depth engagement curve: sessions bucketed by event count,
    * with average per-event value per bucket — "do longer sessions
    * monetize better". Sessionization is the single user-keyed sort;
    * everything after runs on the session reduce. */
  private def q220(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = e
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(count(lit(1)).as("depth"), sum("value").as("sess_value"))
    sess
      .withColumn("bucket",
        when(col("depth") <= 2, "1-2").when(col("depth") <= 5, "3-5")
          .when(col("depth") <= 10, "6-10").otherwise("11+"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_sessions"),
           round(avg(col("sess_value") / col("depth")), 4)
             .as("avg_value_per_event"))
      .orderBy("bucket")
  }

  private val q220Sql =
    """WITH marked AS (
         SELECT user_id, ts, event_id, value,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid,
                value
         FROM marked),
       agg AS (
         SELECT user_id, sid, count(*) AS depth, sum(value) AS sess_value
         FROM sess GROUP BY 1, 2)
       SELECT CASE WHEN depth <= 2 THEN '1-2' WHEN depth <= 5 THEN '3-5'
                   WHEN depth <= 10 THEN '6-10' ELSE '11+' END AS bucket,
              count(*) AS n_sessions,
              round(avg(sess_value / depth), 4) AS avg_value_per_event
       FROM agg GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q218_chi_square"     -> q218 _,
    "q219_trailing_zscore" -> q219 _,
    "q220_session_depth"  -> q220 _)

  override def oracles: Map[String, String] = Map(
    "q218_chi_square"     -> q218Sql,
    "q219_trailing_zscore" -> q219Sql,
    "q220_session_depth"  -> q220Sql)
}
