package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 14: latency distributions (log-scale and
  * calendar), discount-effect analysis, and hot-key skew reporting.
  */
object Extras18 extends QueryPack {

  // --------------------------------------------------------------- q178
  /** Exponential (log2-bucket) histogram of inter-event gaps per user —
    * the latency-distribution shape used for SLO dashboards: fixed
    * bucket count regardless of range, one lag window + one hash agg. */
  private def q178(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e.select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_s",
        (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
          .cast("double") / 1e6)
      .filter(col("gap_s") > 0)
      .withColumn("bucket", floor(log2(col("gap_s"))).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"),
           round(min("gap_s"), 3).as("min_s"),
           round(max("gap_s"), 3).as("max_s"))
      .orderBy("bucket")
  }

  private val q178Sql =
    """WITH gaps AS (
         SELECT (epoch_us(ts) - epoch_us(lag(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)))::DOUBLE
                / 1000000 AS gap_s
         FROM events)
       SELECT CAST(floor(log2(gap_s)) AS INT) AS bucket, count(*) AS n,
              round(min(gap_s), 3) AS min_s, round(max(gap_s), 3) AS max_s
       FROM gaps WHERE gap_s > 0
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q179
  /** Order-to-ship latency: days from order date to each line's ship
    * date, summarized per order priority. The join is fact-to-fact on
    * the order key — co-partitioned, with the day arithmetic map-side. */
  private def q179(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t("lineitem").join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("lat_days",
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"),
           round(avg("lat_days"), 4).as("avg_days"),
           expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY lat_days)")
             .as("median_days"),
           max("lat_days").as("max_days"))
      .orderBy("o_orderpriority")
  }

  private val q179Sql =
    """SELECT o_orderpriority, count(*) AS n_lines,
              round(avg(lat_days), 4) AS avg_days,
              percentile_cont(0.5) WITHIN GROUP (ORDER BY lat_days)
                AS median_days,
              max(lat_days) AS max_days
       FROM (SELECT o_orderpriority,
                    datediff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE)) AS lat_days
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey) x
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q180
  /** Discount-effect profile: quantity and revenue response by discount
    * band — the pricing-analysis staple. Pure map-side banding into one
    * hash aggregate. */
  private def q180(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir)("lineitem")
    li.withColumn("band", (col("l_discount") * 100).cast("int"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"),
           round(avg("l_quantity"), 4).as("avg_qty"),
           round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
             .as("revenue"))
      .orderBy("band")
  }

  private val q180Sql =
    """SELECT CAST(l_discount * 100 AS INT) AS band, count(*) AS n,
              round(avg(l_quantity), 4) AS avg_qty,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q181
  /** Hot-key skew report: the top-20 heaviest users with row share and
    * cumulative share — the diagnostic you run BEFORE choosing a
    * salting factor. One key-grain reduce; the ranking windows run
    * over the reduced key set. */
  private def q181(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val cnt = e.groupBy("user_id").agg(count(lit(1)).as("n"))
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(desc("n"), col("user_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cnt
      .withColumn("share", round(col("n") / sum("n").over(wAll), 6))
      .withColumn("cum_share", round(sum("n").over(wCum) / sum("n").over(wAll), 6))
      .orderBy(desc("n"), col("user_id"))
      .limit(20)
  }

  private val q181Sql =
    """WITH cnt AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1)
       SELECT user_id, n,
              round(n / sum(n) OVER (), 6) AS share,
              round(sum(n) OVER (ORDER BY n DESC, user_id
                                 ROWS UNBOUNDED PRECEDING)
                    / sum(n) OVER (), 6) AS cum_share
       FROM cnt ORDER BY n DESC, user_id LIMIT 20"""

  override def queries: Map[String, QueryFn] = Map(
    "q178_latency_hist"   -> q178 _,
    "q179_ship_latency"   -> q179 _,
    "q180_discount_bands" -> q180 _,
    "q181_skew_report"    -> q181 _)

  override def oracles: Map[String, String] = Map(
    "q178_latency_hist"   -> q178Sql,
    "q179_ship_latency"   -> q179Sql,
    "q180_discount_bands" -> q180Sql,
    "q181_skew_report"    -> q181Sql)
}
