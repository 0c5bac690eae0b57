package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 21: time-bounded conversion, z-score outlier
  * flagging, and inter-event interval statistics.
  */
object Extras25 extends QueryPack {

  // --------------------------------------------------------------- q205
  /** Time-bounded funnel: signup → click within 24h → purchase within
    * 24h of that click. Same chained conditional-min shape as q134 but
    * every stage carries a deadline predicate — the form conversion SLAs
    * are actually measured in. */
  private def q205(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val dayUs = 86400000000L
    val sg = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s_ts"))
    val ck = e.filter(col("event_type") === "click")
      .join(sg, "user_id")
      .filter(col("ts") > col("s_ts") &&
        unix_micros(col("ts")) - unix_micros(col("s_ts")) <= dayUs)
      .groupBy("user_id").agg(min("ts").as("c_ts"))
    val pu = e.filter(col("event_type") === "purchase")
      .join(ck, "user_id")
      .filter(col("ts") > col("c_ts") &&
        unix_micros(col("ts")) - unix_micros(col("c_ts")) <= dayUs)
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    sg.join(ck, Seq("user_id"), "left").join(pu, Seq("user_id"), "left")
      .agg(count(col("user_id")).as("n_signup"),
           count(col("c_ts")).as("n_click_24h"),
           count(col("p_ts")).as("n_purchase_24h"))
  }

  private val q205Sql =
    """WITH sg AS (
         SELECT user_id, min(ts) AS s_ts FROM events
         WHERE event_type = 'signup' GROUP BY 1),
       ck AS (
         SELECT e.user_id, min(e.ts) AS c_ts
         FROM events e JOIN sg ON e.user_id = sg.user_id
         WHERE e.event_type = 'click' AND e.ts > sg.s_ts
           AND epoch_us(e.ts) - epoch_us(sg.s_ts) <= 86400000000
         GROUP BY 1),
       pu AS (
         SELECT e.user_id, min(e.ts) AS p_ts
         FROM events e JOIN ck ON e.user_id = ck.user_id
         WHERE e.event_type = 'purchase' AND e.ts > ck.c_ts
           AND epoch_us(e.ts) - epoch_us(ck.c_ts) <= 86400000000
         GROUP BY 1)
       SELECT count(sg.user_id) AS n_signup,
              count(ck.c_ts) AS n_click_24h,
              count(pu.p_ts) AS n_purchase_24h
       FROM sg LEFT JOIN ck ON sg.user_id = ck.user_id
               LEFT JOIN pu ON sg.user_id = pu.user_id"""

  // --------------------------------------------------------------- q206
  /** Z-score outlier report: events whose value sits more than 3
    * standard deviations above their event type's mean. Per-type
    * moments are one tiny reduce; the outlier scan re-joins them
    * broadcast — no per-row window over the fact table. */
  private def q206(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
      .select(col("event_type"), col("event_id"), col("value"))
    val stats = e.groupBy(col("event_type").as("et"))
      .agg(avg("value").as("mu"), stddev_samp(col("value")).as("sd"))
    e.join(broadcast(stats), col("event_type") === col("et"))
      .withColumn("z", (col("value") - col("mu")) / col("sd"))
      .filter(col("z") > 3)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_outliers"),
           round(max("z"), 4).as("max_z"))
      .orderBy("event_type")
  }

  private val q206Sql =
    """WITH stats AS (
         SELECT event_type AS et, avg(value) AS mu,
                stddev_samp(value) AS sd
         FROM events GROUP BY 1)
       SELECT event_type, count(*) AS n_outliers,
              round(max((value - mu) / sd), 4) AS max_z
       FROM events JOIN stats ON event_type = et
       WHERE (value - mu) / sd > 3
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q207
  /** Inter-purchase interval statistics: days between consecutive
    * orders per customer (lag window), rolled up to a global
    * distribution — the repeat-purchase cadence metric. */
  private def q207(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o.select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      .withColumn("gap", datediff(to_date(col("o_orderdate")),
        to_date(lag(col("o_orderdate"), 1).over(w))))
      .filter(col("gap").isNotNull)
      .agg(count(lit(1)).as("n_intervals"),
           round(avg("gap"), 4).as("avg_days"),
           expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY gap)")
             .as("median_days"),
           max("gap").as("max_days"))
  }

  private val q207Sql =
    """WITH gaps AS (
         SELECT datediff('day',
                  CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey) AS DATE),
                  CAST(o_orderdate AS DATE)) AS gap
         FROM orders)
       SELECT count(*) AS n_intervals, round(avg(gap), 4) AS avg_days,
              percentile_cont(0.5) WITHIN GROUP (ORDER BY gap)
                AS median_days,
              max(gap) AS max_days
       FROM gaps WHERE gap IS NOT NULL"""

  override def queries: Map[String, QueryFn] = Map(
    "q205_funnel_24h"    -> q205 _,
    "q206_zscore_outliers" -> q206 _,
    "q207_purchase_cadence" -> q207 _)

  override def oracles: Map[String, String] = Map(
    "q205_funnel_24h"    -> q205Sql,
    "q206_zscore_outliers" -> q206Sql,
    "q207_purchase_cadence" -> q207Sql)
}
