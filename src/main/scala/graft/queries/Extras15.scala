package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 11: robust statistics (MAD), marketing
  * attribution, percentile-threshold cohorts, correlation matrices,
  * and Benford-law digit profiling.
  */
object Extras15 extends QueryPack {

  // --------------------------------------------------------------- q163
  /** Median absolute deviation of order totals per status — the robust
    * spread statistic. Two median passes (value, then |x − median|),
    * each an ordered-set aggregate per status group; the join in
    * between is 3 rows broadcast against the fact. */
  private def q163(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val med = o.groupBy(col("o_orderstatus").as("st"))
      .agg(expr("median(o_totalprice)").as("med"))
    o.join(broadcast(med), col("o_orderstatus") === col("st"))
      .groupBy(col("o_orderstatus"))
      .agg(round(first(col("med")), 2).as("median_price"),
           round(expr("median(abs(o_totalprice - med))"), 2).as("mad"),
           count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
  }

  private val q163Sql =
    """WITH med AS (
         SELECT o_orderstatus AS st, median(o_totalprice) AS med
         FROM orders GROUP BY 1)
       SELECT o_orderstatus, round(min(med), 2) AS median_price,
              round(median(abs(o_totalprice - med)), 2) AS mad,
              count(*) AS n
       FROM orders JOIN med ON o_orderstatus = st
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q164
  /** Last-touch revenue attribution: each purchase's value credits the
    * user's most recent preceding click or view. One as-of-style
    * fill-forward window over the user-keyed event stream — the same
    * single-sort shape as q34, no join against a sessions table. */
  private def q164(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.withColumn("touch",
        last(when(col("event_type").isin("click", "view"),
          col("event_type")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("touch"), lit("none")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
           round(sum(col("value")), 2).as("revenue"))
      .orderBy("channel")
  }

  private val q164Sql =
    """WITH tagged AS (
         SELECT event_type, value,
                last_value(CASE WHEN event_type IN ('click', 'view')
                                THEN event_type END IGNORE NULLS)
                  OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS touch
         FROM events)
       SELECT coalesce(touch, 'none') AS channel,
              count(*) AS n_purchases, round(sum(value), 2) AS revenue
       FROM tagged WHERE event_type = 'purchase'
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q165
  /** Top-decile cohort per nation: customers whose spend exceeds their
    * nation's p90. The threshold table is one ordered-set aggregate
    * per nation (25 rows) and broadcasts back — never a per-row window
    * over the full customer set. */
  private def q165(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val spend = t("orders").join(t("customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(round(sum(col("o_totalprice")), 2).as("spend"))
    val thr = spend.groupBy(col("c_nationkey").as("nk"))
      .agg(expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY spend)")
        .as("p90"))
    spend.join(broadcast(thr), col("c_nationkey") === col("nk"))
      .filter(col("spend") > col("p90"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_top"), round(sum("spend"), 2).as("top_spend"))
      .orderBy("c_nationkey")
  }

  private val q165Sql =
    """WITH spend AS (
         SELECT c_nationkey, c_custkey, round(sum(o_totalprice), 2) AS spend
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY 1, 2),
       thr AS (
         SELECT c_nationkey AS nk,
                percentile_cont(0.9) WITHIN GROUP (ORDER BY spend) AS p90
         FROM spend GROUP BY 1)
       SELECT c_nationkey, count(*) AS n_top,
              round(sum(spend), 2) AS top_spend
       FROM spend JOIN thr ON c_nationkey = nk
       WHERE spend > p90
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q166
  /** Pairwise correlation matrix over lineitem's numeric measures,
    * unpivoted to (x, y, corr) rows. All six pairs compute in ONE
    * aggregate pass (mergeable central moments), then stack() reshapes
    * the single row — no per-pair scans. */
  private def q166(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir)("lineitem")
    li.agg(
        corr("l_quantity", "l_extendedprice").as("qty_price"),
        corr("l_quantity", "l_discount").as("qty_disc"),
        corr("l_quantity", "l_tax").as("qty_tax"),
        corr("l_extendedprice", "l_discount").as("price_disc"),
        corr("l_extendedprice", "l_tax").as("price_tax"),
        corr("l_discount", "l_tax").as("disc_tax"))
      .select(expr(
        """stack(6,
             'l_quantity', 'l_extendedprice', qty_price,
             'l_quantity', 'l_discount', qty_disc,
             'l_quantity', 'l_tax', qty_tax,
             'l_extendedprice', 'l_discount', price_disc,
             'l_extendedprice', 'l_tax', price_tax,
             'l_discount', 'l_tax', disc_tax) AS (x, y, r)"""))
      .select(col("x"), col("y"), round(col("r"), 6).as("r"))
      .orderBy("x", "y")
  }

  private val q166Sql =
    """WITH m AS (
         SELECT corr(l_quantity, l_extendedprice) AS qty_price,
                corr(l_quantity, l_discount) AS qty_disc,
                corr(l_quantity, l_tax) AS qty_tax,
                corr(l_extendedprice, l_discount) AS price_disc,
                corr(l_extendedprice, l_tax) AS price_tax,
                corr(l_discount, l_tax) AS disc_tax
         FROM lineitem)
       SELECT x, y, round(r, 6) AS r FROM m,
         LATERAL (VALUES
           ('l_quantity', 'l_extendedprice', qty_price),
           ('l_quantity', 'l_discount', qty_disc),
           ('l_quantity', 'l_tax', qty_tax),
           ('l_extendedprice', 'l_discount', price_disc),
           ('l_extendedprice', 'l_tax', price_tax),
           ('l_discount', 'l_tax', disc_tax)) AS v(x, y, r)
       ORDER BY x, y"""

  // --------------------------------------------------------------- q167
  /** Benford first-digit profile of order totals: observed leading-
    * digit frequencies vs the log10(1 + 1/d) expectation — the fraud-
    * screening classic. One map-side digit extraction, one 9-row
    * aggregate. */
  private def q167(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val wAll = Window.partitionBy()
    o.select(substring(col("o_totalprice").cast("string"), 1, 1)
        .cast("int").as("d"))
      .filter(col("d").between(1, 9))
      .groupBy("d").agg(count(lit(1)).as("n"))
      .withColumn("observed", round(col("n") / sum("n").over(wAll), 6))
      .withColumn("benford", round(log10(lit(1) + lit(1) / col("d")), 6))
      .orderBy("d")
  }

  private val q167Sql =
    """WITH digits AS (
         SELECT CAST(substring(CAST(o_totalprice AS VARCHAR), 1, 1) AS INT)
                  AS d
         FROM orders),
       cnt AS (
         SELECT d, count(*) AS n FROM digits
         WHERE d BETWEEN 1 AND 9 GROUP BY 1)
       SELECT d, n, round(n / sum(n) OVER (), 6) AS observed,
              round(log10(1 + 1.0 / d), 6) AS benford
       FROM cnt ORDER BY d"""

  override def queries: Map[String, QueryFn] = Map(
    "q163_mad"         -> q163 _,
    "q164_attribution" -> q164 _,
    "q165_top_decile"  -> q165 _,
    "q166_corr_matrix" -> q166 _,
    "q167_benford"     -> q167 _)

  override def oracles: Map[String, String] = Map(
    "q163_mad"         -> q163Sql,
    "q164_attribution" -> q164Sql,
    "q165_top_decile"  -> q165Sql,
    "q166_corr_matrix" -> q166Sql,
    "q167_benford"     -> q167Sql)
}
