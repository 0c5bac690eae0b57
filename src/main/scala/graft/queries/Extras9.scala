package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.PageRank

/** Round-4 surface, part 5: iterative graph dataflow (PageRank over the
  * trade graph) and classic product analytics (conversion funnel).
  */
object Extras9 extends QueryPack {

  // --------------------------------------------------------------- q133
  /** PageRank over the nation trade graph: edge src→dst when a customer
    * in nation src bought from a supplier in nation dst. Five unrolled
    * iterations so the oracle can spell the same computation as a CTE
    * chain (recursive CTEs disallow the per-iteration aggregate). The
    * graph build is the distributed work at scale (4-table join); the
    * rank loop moves only the 25-row rank vector per iteration. */
  private def q133(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val edges = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
    PageRank.run(edges, iters = 5)
      .select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy("node")
  }

  /** CTE-chain oracle: pr0..pr5 unrolled, same simplified formulation
    * (no dangling-mass term). Literals cast to DOUBLE — DuckDB reads
    * bare 0.15 as DECIMAL and decimal-vs-double arithmetic would
    * diverge in late bits. */
  private val q133Sql: String = {
    val base =
      """WITH e AS (
           SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         pr0 AS (SELECT node, 1.0::DOUBLE AS rank FROM nodes)"""
    val iters = (1 to 5).map { k =>
      s""",
         pr$k AS (
           SELECT n.node,
                  (1.0::DOUBLE - 0.85::DOUBLE)
                  + 0.85::DOUBLE * coalesce(m.mass, 0::DOUBLE) AS rank
           FROM nodes n LEFT JOIN (
             SELECT e.dst AS node, sum(p.rank / od.outdeg) AS mass
             FROM pr${k - 1} p
             JOIN e ON p.node = e.src
             JOIN od ON e.src = od.src
             GROUP BY 1) m ON n.node = m.node)"""
    }.mkString
    base + iters +
      "\n       SELECT node, round(rank, 6) AS rank FROM pr5 ORDER BY node"
  }

  // --------------------------------------------------------------- q134
  /** Conversion funnel with event-order constraints: first signup, then
    * first click AFTER the signup, then first purchase AFTER that
    * click. Each stage is a filter-join-min at the user grain — shuffle
    * keys stay user_id end to end, so the funnel is one partitioning at
    * scale. */
  private def q134(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val sg = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s_ts"))
    val ck = e.filter(col("event_type") === "click")
      .join(sg, "user_id").filter(col("ts") > col("s_ts"))
      .groupBy("user_id").agg(min("ts").as("c_ts"))
    val pu = e.filter(col("event_type") === "purchase")
      .join(ck, "user_id").filter(col("ts") > col("c_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    sg.join(ck, Seq("user_id"), "left").join(pu, Seq("user_id"), "left")
      .agg(count(col("user_id")).as("n_signup"),
           count(col("c_ts")).as("n_click"),
           count(col("p_ts")).as("n_purchase"),
           round(count(col("c_ts")) / count(col("user_id")), 4).as("click_rate"),
           round(count(col("p_ts")) / count(col("c_ts")), 4).as("purchase_rate"))
  }

  private val q134Sql =
    """WITH sg AS (
         SELECT user_id, min(ts) AS s_ts FROM events
         WHERE event_type = 'signup' GROUP BY 1),
       ck AS (
         SELECT e.user_id, min(e.ts) AS c_ts
         FROM events e JOIN sg ON e.user_id = sg.user_id
         WHERE e.event_type = 'click' AND e.ts > sg.s_ts GROUP BY 1),
       pu AS (
         SELECT e.user_id, min(e.ts) AS p_ts
         FROM events e JOIN ck ON e.user_id = ck.user_id
         WHERE e.event_type = 'purchase' AND e.ts > ck.c_ts GROUP BY 1)
       SELECT count(sg.user_id) AS n_signup,
              count(ck.c_ts) AS n_click,
              count(pu.p_ts) AS n_purchase,
              round(count(ck.c_ts) / count(sg.user_id), 4) AS click_rate,
              round(count(pu.p_ts) / count(ck.c_ts), 4) AS purchase_rate
       FROM sg LEFT JOIN ck ON sg.user_id = ck.user_id
               LEFT JOIN pu ON sg.user_id = pu.user_id"""

  // --------------------------------------------------------------- q135
  /** Cohort retention matrix: users grouped by signup week, counted in
    * each subsequent activity week. Both sides reduce to (user, week)
    * grain BEFORE the join — the scale move: the join input is distinct
    * weeks per user, not raw events. */
  private def q135(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val sg = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(date_trunc("week", min(col("ts"))).as("cohort"))
    val act = e.select(col("user_id"),
      date_trunc("week", col("ts")).as("w")).distinct()
    sg.join(act, "user_id").filter(col("w") >= col("cohort"))
      .groupBy(col("cohort").cast("date").as("cohort_week"),
        (datediff(col("w").cast("date"), col("cohort").cast("date")) / 7)
          .cast("int").as("week_offset"))
      .agg(count_distinct(col("user_id")).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  private val q135Sql =
    """WITH sg AS (
         SELECT user_id, date_trunc('week', min(ts)) AS cohort
         FROM events WHERE event_type = 'signup' GROUP BY 1),
       act AS (
         SELECT DISTINCT user_id, date_trunc('week', ts) AS w FROM events)
       SELECT CAST(sg.cohort AS DATE) AS cohort_week,
              CAST(datediff('day', CAST(sg.cohort AS DATE),
                            CAST(a.w AS DATE)) / 7 AS INT) AS week_offset,
              count(DISTINCT a.user_id) AS n_users
       FROM sg JOIN act a ON sg.user_id = a.user_id
       WHERE a.w >= sg.cohort
       GROUP BY 1, 2 ORDER BY 1, 2"""

  // --------------------------------------------------------------- q136
  /** Event-path bigrams: per-user transition pairs via lead() over
    * (ts, event_id), top 20 by frequency. The sequence analysis
    * primitive behind "what do users do after X". */
  private def q136(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e.select(col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"))
      .filter(col("next_type").isNotNull)
      .groupBy("event_type", "next_type").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("event_type"), col("next_type"))
      .limit(20)
  }

  private val q136Sql =
    """WITH p AS (
         SELECT event_type,
                lead(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS next_type
         FROM events)
       SELECT event_type, next_type, count(*) AS n
       FROM p WHERE next_type IS NOT NULL
       GROUP BY 1, 2
       ORDER BY n DESC, event_type, next_type LIMIT 20"""

  override def queries: Map[String, QueryFn] = Map(
    "q133_pagerank" -> q133 _,
    "q134_funnel"   -> q134 _,
    "q135_cohort"   -> q135 _,
    "q136_paths"    -> q136 _)

  override def oracles: Map[String, String] = Map(
    "q133_pagerank" -> q133Sql,
    "q134_funnel"   -> q134Sql,
    "q135_cohort"   -> q135Sql,
    "q136_paths"    -> q136Sql)
}
