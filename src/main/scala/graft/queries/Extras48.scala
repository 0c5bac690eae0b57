package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 44: operational-analytics sweep — price-move
  * detection, purchase episodes, sourcing risk, load seasonality,
  * freshness SLAs, and rank-distribution checks. Every query is pure
  * integer logic (counts, islands, integer-inequality thresholds,
  * exact percent_rank ratios) — zero rounding dependencies. */
object Extras48 extends QueryPack {

  // --------------------------------------------------------------- q307
  /** Price-move detector: per (part, year) integer-cents unit prices
    * (the q283 grain); a >5% year-over-year move is the INTEGER
    * inequality 20·|Δ| > p_prev — no float thresholds. Moves roll up
    * per brand. */
  private def q307(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val py = t("lineitem")
      .groupBy(col("l_partkey").as("pk"), year(col("l_shipdate")).as("yr"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5)).as("cents"),
        sum(col("l_quantity")).cast("long").as("qty"))
      .select(col("pk"), col("yr"),
        floor(col("cents").cast("double") / col("qty") + 0.5)
          .cast("long").as("p"))
    val w = Window.partitionBy("pk").orderBy("yr")
    val moves = py.withColumn("pp", lag(col("p"), 1).over(w))
      .filter(col("pp").isNotNull)
      .select(col("pk"),
        when(lit(20) * (col("p") - col("pp")) > col("pp"), 1L)
          .otherwise(0L).as("up"),
        when(lit(20) * (col("pp") - col("p")) > col("pp"), 1L)
          .otherwise(0L).as("down"))
    moves.join(broadcast(t("part").select(col("p_partkey").as("pk"),
        col("p_brand").as("brand"))), "pk")
      .groupBy("brand")
      .agg(count(lit(1)).as("n_transitions"),
        sum("up").as("n_up"), sum("down").as("n_down"))
      .select(col("brand"), col("n_transitions").cast("long")
          .as("n_transitions"),
        col("n_up").cast("long").as("n_up"),
        col("n_down").cast("long").as("n_down"))
      .orderBy("brand")
  }

  private val q307Sql =
    """WITH py AS (
         SELECT l_partkey AS pk, CAST(year(l_shipdate) AS INT) AS yr,
                CAST(floor(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                    AS BIGINT)) AS DOUBLE)
                  / CAST(sum(l_quantity) AS BIGINT) + 0.5) AS BIGINT) AS p
         FROM lineitem GROUP BY 1, 2),
       mv AS (
         SELECT pk, p,
                lag(p) OVER (PARTITION BY pk ORDER BY yr) AS pp
         FROM py),
       flags AS (
         SELECT pk,
                CASE WHEN 20 * (p - pp) > pp THEN 1 ELSE 0 END AS up,
                CASE WHEN 20 * (pp - p) > pp THEN 1 ELSE 0 END AS down
         FROM mv WHERE pp IS NOT NULL)
       SELECT pt.p_brand AS brand,
              CAST(count(*) AS BIGINT) AS n_transitions,
              CAST(sum(up) AS BIGINT) AS n_up,
              CAST(sum(down) AS BIGINT) AS n_down
       FROM flags JOIN part pt ON flags.pk = pt.p_partkey
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q308
  /** Purchase-episode distribution: a customer's orders within 90 days
    * of the previous one chain into an episode (gaps-and-islands on
    * the order stream); output how many customers have k episodes and
    * the mean orders-per-episode at each k — the cadence profile
    * behind reorder campaigns. */
  private def q308(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val marked = o
      .withColumn("gap",
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)))
      .withColumn("brk",
        when(col("gap").isNull || col("gap") > 90, 1L).otherwise(0L))
      .withColumn("ep", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val per = marked.groupBy("o_custkey")
      .agg(max("ep").as("k"), count(lit(1)).as("n_orders"))
    per.groupBy("k")
      .agg(count(lit(1)).as("n_customers"),
        sum("n_orders").as("tot_orders"))
      .select(col("k").cast("long").as("k_episodes"),
        col("n_customers").cast("long").as("n_customers"),
        round(col("tot_orders").cast("double")
          / (col("k") * col("n_customers")), 4)
          .as("avg_orders_per_episode"))
      .orderBy("k_episodes")
  }

  private val q308Sql =
    """WITH marked AS (
         SELECT o_custkey, o_orderdate, o_orderkey,
                CASE WHEN lag(o_orderdate) OVER w IS NULL
                       OR datediff('day', lag(o_orderdate) OVER w,
                            o_orderdate) > 90
                     THEN 1 ELSE 0 END AS brk
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)),
       eps AS (
         SELECT o_custkey,
                sum(brk) OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ep
         FROM marked),
       per AS (
         SELECT o_custkey, max(ep) AS k, count(*) AS n_orders
         FROM eps GROUP BY 1)
       SELECT CAST(k AS BIGINT) AS k_episodes,
              CAST(count(*) AS BIGINT) AS n_customers,
              round(CAST(sum(n_orders) AS DOUBLE) / (k * count(*)), 4)
                AS avg_orders_per_episode
       FROM per GROUP BY k ORDER BY 1"""

  // --------------------------------------------------------------- q309
  /** Sourcing-risk screen: parts shipped by exactly one distinct
    * supplier are single-sourced; per brand, how many and what share.
    * Two integer reduces. */
  private def q309(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val perPart = t("lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(countDistinct("l_suppkey").as("n_supp"))
    perPart.join(broadcast(t("part").select(col("p_partkey").as("pk"),
        col("p_brand").as("brand"))), "pk")
      .groupBy("brand")
      .agg(count(lit(1)).as("n_parts"),
        sum(when(col("n_supp") === 1, 1L).otherwise(0L))
          .as("n_single"))
      .select(col("brand"), col("n_parts").cast("long").as("n_parts"),
        col("n_single").cast("long").as("n_single_sourced"),
        round(col("n_single").cast("double") / col("n_parts"), 5)
          .as("single_share"))
      .orderBy("brand")
  }

  private val q309Sql =
    """WITH per AS (
         SELECT l_partkey AS pk, count(DISTINCT l_suppkey) AS n_supp
         FROM lineitem GROUP BY 1)
       SELECT pt.p_brand AS brand, CAST(count(*) AS BIGINT) AS n_parts,
              CAST(sum(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_single_sourced,
              round(CAST(sum(CASE WHEN n_supp = 1 THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*), 5) AS single_share
       FROM per JOIN part pt ON per.pk = pt.p_partkey
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q310
  /** Load seasonality: per event type its busiest hour-of-day (ties →
    * earliest hour), that hour's share of the type's traffic, and the
    * quietest-hour count — capacity planning in five rows of integer
    * arithmetic. */
  private def q310(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val byHour = e.groupBy(col("event_type"),
        hour(col("ts")).as("h"))
      .agg(count(lit(1)).as("c"))
    val pick = Window.partitionBy("event_type")
      .orderBy(col("c").desc, col("h").asc)
    byHour
      .withColumn("tot", sum("c").over(Window.partitionBy("event_type")))
      .withColumn("mn", min("c").over(Window.partitionBy("event_type")))
      .withColumn("rn", row_number().over(pick))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("h").cast("int").as("peak_hour"),
        col("c").cast("long").as("peak_n"),
        round(col("c").cast("double") / col("tot"), 5).as("peak_share"),
        col("mn").cast("long").as("quietest_hour_n"))
      .orderBy("event_type")
  }

  private val q310Sql =
    """WITH by_hour AS (
         SELECT event_type, CAST(hour(ts) AS INT) AS h, count(*) AS c
         FROM events GROUP BY 1, 2),
       ranked AS (
         SELECT event_type, h, c,
                sum(c) OVER (PARTITION BY event_type) AS tot,
                min(c) OVER (PARTITION BY event_type) AS mn,
                row_number() OVER (PARTITION BY event_type
                  ORDER BY c DESC, h ASC) AS rn
         FROM by_hour)
       SELECT event_type, CAST(h AS INT) AS peak_hour,
              CAST(c AS BIGINT) AS peak_n,
              round(CAST(c AS DOUBLE) / tot, 5) AS peak_share,
              CAST(mn AS BIGINT) AS quietest_hour_n
       FROM ranked WHERE rn = 1 ORDER BY event_type"""

  // --------------------------------------------------------------- q311
  /** Freshness-lag audit: per nation, the most recent order date and
    * how many days it trails the global maximum — the per-partition
    * staleness table a 100 TB ingest job alerts on. Integer date
    * arithmetic; the 1-row global max rides a broadcast. */
  private def q311(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val perNation = t("orders")
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("nation")),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(max("o_orderdate").as("last_order"))
    val global = perNation.agg(max("last_order").as("g"))
    perNation.crossJoin(broadcast(global))
      .select(col("nation"), col("last_order").cast("date")
          .as("last_order"),
        datediff(col("g"), col("last_order")).cast("int")
          .as("days_behind"))
      .orderBy("nation")
  }

  private val q311Sql =
    """WITH per AS (
         SELECT n.n_name AS nation, max(o.o_orderdate) AS last_order
         FROM orders o
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
         GROUP BY 1),
       g AS (SELECT max(last_order) AS g FROM per)
       SELECT nation, CAST(last_order AS DATE) AS last_order,
              CAST(datediff('day', last_order, g) AS INT) AS days_behind
       FROM per CROSS JOIN g ORDER BY nation"""

  // --------------------------------------------------------------- q312
  /** Rank-distribution sanity: percent_rank of order value within its
    * month, bucketed into deciles and aggregated — a uniform
    * distribution is the invariant; drift flags a broken rank or a
    * degenerate value column. percent_rank is the exact integer ratio
    * (rank−1)/(n−1), identical in both engines. */
  private def q312(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val w = Window.partitionBy(date_trunc("month", col("o_orderdate")))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    o.select(least(floor(percent_rank().over(w) * 10), lit(9.0))
        .cast("int").as("decile"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n"))
      .withColumn("share",
        round(col("n").cast("double")
          / sum("n").over(Window.partitionBy()), 5))
      .select(col("decile"), col("n").cast("long").as("n"), col("share"))
      .orderBy("decile")
  }

  private val q312Sql =
    """WITH pr AS (
         SELECT least(CAST(floor(percent_rank() OVER (
                  PARTITION BY date_trunc('month', o_orderdate)
                  ORDER BY o_totalprice, o_orderkey) * 10) AS INT),
                9) AS decile
         FROM orders),
       counts AS (SELECT decile, count(*) AS n FROM pr GROUP BY 1)
       SELECT CAST(decile AS INT) AS decile, CAST(n AS BIGINT) AS n,
              round(CAST(n AS DOUBLE) / sum(n) OVER (), 5) AS share
       FROM counts ORDER BY decile"""

  override def queries: Map[String, QueryFn] = Map(
    "q307_price_moves"    -> q307 _,
    "q308_order_episodes" -> q308 _,
    "q309_single_source"  -> q309 _,
    "q310_peak_hours"     -> q310 _,
    "q311_freshness_lags" -> q311 _,
    "q312_percentile_grid" -> q312 _)

  override def oracles: Map[String, String] = Map(
    "q307_price_moves"    -> q307Sql,
    "q308_order_episodes" -> q308Sql,
    "q309_single_source"  -> q309Sql,
    "q310_peak_hours"     -> q310Sql,
    "q311_freshness_lags" -> q311Sql,
    "q312_percentile_grid" -> q312Sql)
}
