package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 16: weighted moments, count-of-counts
  * distributions, the Pareto 80/20 metric, Theil inequality, and
  * cohort time-to-convert.
  */
object Extras20 extends QueryPack {

  // --------------------------------------------------------------- q186
  /** Weighted mean and weighted variance of discount by quantity
    * weight — one aggregate of three weighted sums, no second pass. */
  private def q186(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir)("lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("w"),
           sum(col("l_quantity") * col("l_discount")).as("wx"),
           sum(col("l_quantity") * col("l_discount") * col("l_discount"))
             .as("wx2"))
      .select(col("l_returnflag"),
        round(col("wx") / col("w"), 6).as("wmean"),
        round(col("wx2") / col("w") -
          (col("wx") / col("w")) * (col("wx") / col("w")), 6).as("wvar"))
      .orderBy("l_returnflag")
  }

  private val q186Sql =
    """WITH a AS (
         SELECT l_returnflag, sum(l_quantity) AS w,
                sum(l_quantity * l_discount) AS wx,
                sum(l_quantity * l_discount * l_discount) AS wx2
         FROM lineitem GROUP BY 1)
       SELECT l_returnflag, round(wx / w, 6) AS wmean,
              round(wx2 / w - (wx / w) * (wx / w), 6) AS wvar
       FROM a ORDER BY 1"""

  // --------------------------------------------------------------- q187
  /** Count-of-counts: the distribution of lines-per-order — a double
    * aggregate where the second input is the first's output (orders ×
    * 1 row), the shape behind "how big are my groups" diagnostics. */
  private def q187(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir)("lineitem")
    li.groupBy("l_orderkey").agg(count(lit(1)).as("n_lines"))
      .groupBy("n_lines").agg(count(lit(1)).as("n_orders"))
      .orderBy("n_lines")
  }

  private val q187Sql =
    """WITH per_order AS (
         SELECT l_orderkey, count(*) AS n_lines FROM lineitem GROUP BY 1)
       SELECT n_lines, count(*) AS n_orders
       FROM per_order GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q188
  /** Pareto 80/20: the smallest customer fraction contributing 80% of
    * revenue. Rank + cumulative-share windows over the customer-grain
    * reduce, then one scalar min over the crossing point. */
  private def q188(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val spend = o.groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("x"))
    val wCum = Window.orderBy(desc("x"), col("o_custkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    val crossing = spend
      .withColumn("r", row_number().over(
        Window.orderBy(desc("x"), col("o_custkey"))))
      .withColumn("cum", sum("x").over(wCum) / sum("x").over(wAll))
      .filter(col("cum") >= 0.8)
      .agg(min(col("r")).as("n_top"))
    crossing.join(spend.agg(count(lit(1)).as("n_total")))
      .select(col("n_top"), col("n_total"),
        round(col("n_top") / col("n_total").cast("double"), 6)
          .as("top_fraction"))
  }

  private val q188Sql =
    """WITH spend AS (
         SELECT o_custkey, sum(o_totalprice) AS x FROM orders GROUP BY 1),
       ranked AS (
         SELECT x,
                row_number() OVER (ORDER BY x DESC, o_custkey) AS r,
                sum(x) OVER (ORDER BY x DESC, o_custkey
                             ROWS UNBOUNDED PRECEDING)
                  / sum(x) OVER () AS cum
         FROM spend)
       SELECT min(r) AS n_top,
              (SELECT count(*) FROM spend) AS n_total,
              round(min(r) / (SELECT count(*) FROM spend)::DOUBLE, 6)
                AS top_fraction
       FROM ranked WHERE cum >= 0.8"""

  // --------------------------------------------------------------- q189
  /** Theil T index of customer spend — the entropy-based inequality
    * measure (decomposable across groups, unlike Gini q149). One
    * customer reduce, one scalar aggregate of x·ln(x/mean). */
  private def q189(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val spend = o.groupBy("o_custkey")
      .agg(sum(col("o_totalprice")).as("x"))
    val wAll = Window.partitionBy()
    spend
      .withColumn("mu", avg("x").over(wAll))
      .agg(round(avg(col("x") / col("mu") * log(col("x") / col("mu"))), 6)
        .as("theil_t"), count(lit(1)).as("n_customers"))
  }

  private val q189Sql =
    """WITH spend AS (
         SELECT o_custkey, sum(o_totalprice) AS x FROM orders GROUP BY 1),
       m AS (SELECT avg(x) AS mu FROM spend)
       SELECT round(avg(x / mu * ln(x / mu)), 6) AS theil_t,
              count(*) AS n_customers
       FROM spend, m"""

  // --------------------------------------------------------------- q190
  /** Cohort time-to-convert: median days from first signup to first
    * purchase, grouped by signup week — q150's latency metric at
    * cohort grain, every shuffle on user_id until the final tiny
    * cohort aggregate. */
  private def q190(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val sg = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s_ts"))
    val pu = e.filter(col("event_type") === "purchase")
      .join(sg, "user_id").filter(col("ts") > col("s_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    sg.join(pu, "user_id")
      .select(date_trunc("week", col("s_ts")).cast("date").as("cohort_week"),
        ((unix_micros(col("p_ts")) - unix_micros(col("s_ts"))) / 86400e6)
          .as("days"))
      .groupBy("cohort_week")
      .agg(count(lit(1)).as("n_converted"),
           round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY days)"), 4)
             .as("median_days"))
      .orderBy("cohort_week")
  }

  private val q190Sql =
    """WITH sg AS (
         SELECT user_id, min(ts) AS s_ts FROM events
         WHERE event_type = 'signup' GROUP BY 1),
       pu AS (
         SELECT e.user_id, min(e.ts) AS p_ts
         FROM events e JOIN sg ON e.user_id = sg.user_id
         WHERE e.event_type = 'purchase' AND e.ts > sg.s_ts GROUP BY 1),
       lat AS (
         SELECT CAST(date_trunc('week', s_ts) AS DATE) AS cohort_week,
                (epoch_us(p_ts) - epoch_us(s_ts)) / 86400000000.0 AS days
         FROM sg JOIN pu ON sg.user_id = pu.user_id)
       SELECT cohort_week, count(*) AS n_converted,
              round(percentile_cont(0.5) WITHIN GROUP (ORDER BY days), 4)
                AS median_days
       FROM lat GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q186_weighted_moments" -> q186 _,
    "q187_count_of_counts"  -> q187 _,
    "q188_pareto"           -> q188 _,
    "q189_theil"            -> q189 _,
    "q190_cohort_convert"   -> q190 _)

  override def oracles: Map[String, String] = Map(
    "q186_weighted_moments" -> q186Sql,
    "q187_count_of_counts"  -> q187Sql,
    "q188_pareto"           -> q188Sql,
    "q189_theil"            -> q189Sql,
    "q190_cohort_convert"   -> q190Sql)
}
