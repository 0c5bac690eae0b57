package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 12: time-series resampling with linear
  * interpolation, graph triangle counting, and within-session funnels.
  */
object Extras16 extends QueryPack {

  // --------------------------------------------------------------- q168
  /** Resample + linear interpolation: daily URGENT-priority revenue is
    * sparse; build the full day spine between first and last
    * observation and lerp the gaps from the bracketing known points.
    * Spine generation is one sequence() explode; prev/next known
    * values are two IGNORE NULLS window passes over ONE ordered
    * series (partition by series key at scale — the global window
    * here is the 2.4k-row day spine, not the fact table). */
  private def q168(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val daily = o.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(round(sum("o_totalprice"), 2).as("rev"))
    val bounds = daily.agg(min("d").as("lo"), max("d").as("hi"))
    val spine = bounds.select(
      explode(expr("sequence(lo, hi, interval 1 day)")).as("d"))
    val wPrev = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.orderBy("d")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    spine.join(daily, Seq("d"), "left")
      .withColumn("pd", last(when(col("rev").isNotNull, col("d")),
        ignoreNulls = true).over(wPrev))
      .withColumn("pv", last(col("rev"), ignoreNulls = true).over(wPrev))
      .withColumn("nd", first(when(col("rev").isNotNull, col("d")),
        ignoreNulls = true).over(wNext))
      .withColumn("nv", first(col("rev"), ignoreNulls = true).over(wNext))
      .select(col("d"),
        round(when(col("rev").isNotNull, col("rev")).otherwise(
          col("pv") + (col("nv") - col("pv")) *
            datediff(col("d"), col("pd")) /
            datediff(col("nd"), col("pd"))), 4).as("rev"),
        when(col("rev").isNull, 1).otherwise(0).as("interpolated"))
      .filter(col("d") < lit("1995-04-01").cast("date"))
      .orderBy("d")
  }

  private val q168Sql =
    """WITH daily AS (
         SELECT CAST(o_orderdate AS DATE) AS d,
                round(sum(o_totalprice), 2) AS rev
         FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1),
       bounds AS (SELECT min(d) AS lo, max(d) AS hi FROM daily),
       spine AS (
         SELECT CAST(u.x AS DATE) AS d
         FROM bounds, unnest(generate_series(lo, hi,
                                             INTERVAL 1 DAY)) AS u(x)),
       joined AS (
         SELECT spine.d, daily.rev FROM spine
         LEFT JOIN daily ON spine.d = daily.d),
       ctx AS (
         SELECT d, rev,
           last_value(CASE WHEN rev IS NOT NULL THEN d END IGNORE NULLS)
             OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS pd,
           last_value(rev IGNORE NULLS)
             OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS pv,
           first_value(CASE WHEN rev IS NOT NULL THEN d END IGNORE NULLS)
             OVER (ORDER BY d ROWS BETWEEN CURRENT ROW
                   AND UNBOUNDED FOLLOWING) AS nd,
           first_value(rev IGNORE NULLS)
             OVER (ORDER BY d ROWS BETWEEN CURRENT ROW
                   AND UNBOUNDED FOLLOWING) AS nv
         FROM joined)
       SELECT d,
              round(CASE WHEN rev IS NOT NULL THEN rev
                         ELSE pv + (nv - pv) * datediff('day', pd, d)
                              / datediff('day', pd, nd) END, 4) AS rev,
              CASE WHEN rev IS NULL THEN 1 ELSE 0 END AS interpolated
       FROM ctx WHERE d < DATE '1995-04-01' ORDER BY d"""

  // --------------------------------------------------------------- q169
  /** Triangle count over the undirected nation trade graph: canonical
    * a<b edges, two-hop join, closing-edge semi-join. The graph build
    * (4-table join) is the distributed work; the triangle join runs on
    * the tiny edge reduce. Degeneracy ordering (a<b<c) counts each
    * triangle exactly once — the standard distributed formulation. */
  private def q169(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val raw = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("u"), col("s_nationkey").as("v"))
      .filter(col("u") =!= col("v"))
    val edges = raw.select(least(col("u"), col("v")).as("a"),
        greatest(col("u"), col("v")).as("b")).distinct()
    val e1 = edges.select(col("a"), col("b"))
    val e2 = edges.select(col("a").as("b"), col("b").as("c"))
    val e3 = edges.select(col("a").as("xa"), col("b").as("xc"))
    e1.join(e2, "b")
      .join(e3, col("a") === col("xa") && col("c") === col("xc"))
      .agg(count(lit(1)).as("n_triangles"))
  }

  private val q169Sql =
    """WITH raw AS (
         SELECT DISTINCT least(c_nationkey, s_nationkey) AS a,
                greatest(c_nationkey, s_nationkey) AS b
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE c_nationkey <> s_nationkey)
       SELECT count(*) AS n_triangles
       FROM raw e1
       JOIN raw e2 ON e1.b = e2.a
       JOIN raw e3 ON e1.a = e3.a AND e2.b = e3.b"""

  // --------------------------------------------------------------- q170
  /** Within-session funnel: signup → later click → later purchase must
    * all happen INSIDE one 30-minute-gap session. Sessionize with the
    * running-sum window (one user-keyed sort), then three conditional-
    * min aggregations at (user, session) grain chained by join — each
    * stage input shrinks, and every shuffle key is (user, sid). */
  private def q170(s: SparkSession, dir: String): DataFrame = {
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
    val sg = sess.filter(col("event_type") === "signup")
      .groupBy("user_id", "sid").agg(min("ts").as("s_ts"))
    val ck = sess.filter(col("event_type") === "click")
      .join(sg, Seq("user_id", "sid")).filter(col("ts") > col("s_ts"))
      .groupBy("user_id", "sid").agg(min("ts").as("c_ts"))
    val pu = sess.filter(col("event_type") === "purchase")
      .join(ck, Seq("user_id", "sid")).filter(col("ts") > col("c_ts"))
      .groupBy("user_id", "sid").agg(min("ts").as("p_ts"))
    sg.join(ck, Seq("user_id", "sid"), "left")
      .join(pu, Seq("user_id", "sid"), "left")
      .agg(count(lit(1)).as("n_signup_sessions"),
           count(col("c_ts")).as("n_click"),
           count(col("p_ts")).as("n_purchase"))
  }

  private val q170Sql =
    """WITH marked AS (
         SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id, event_type, ts,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid
         FROM marked),
       sg AS (
         SELECT user_id, sid, min(ts) AS s_ts FROM sess
         WHERE event_type = 'signup' GROUP BY 1, 2),
       ck AS (
         SELECT s.user_id, s.sid, min(s.ts) AS c_ts
         FROM sess s JOIN sg ON s.user_id = sg.user_id AND s.sid = sg.sid
         WHERE s.event_type = 'click' AND s.ts > sg.s_ts GROUP BY 1, 2),
       pu AS (
         SELECT s.user_id, s.sid, min(s.ts) AS p_ts
         FROM sess s JOIN ck ON s.user_id = ck.user_id AND s.sid = ck.sid
         WHERE s.event_type = 'purchase' AND s.ts > ck.c_ts GROUP BY 1, 2)
       SELECT count(*) AS n_signup_sessions,
              count(ck.c_ts) AS n_click,
              count(pu.p_ts) AS n_purchase
       FROM sg LEFT JOIN ck ON sg.user_id = ck.user_id AND sg.sid = ck.sid
               LEFT JOIN pu ON sg.user_id = pu.user_id AND sg.sid = pu.sid"""

  override def queries: Map[String, QueryFn] = Map(
    "q168_interpolate"    -> q168 _,
    "q169_triangles"      -> q169 _,
    "q170_session_funnel" -> q170 _)

  override def oracles: Map[String, String] = Map(
    "q168_interpolate"    -> q168Sql,
    "q169_triangles"      -> q169Sql,
    "q170_session_funnel" -> q170Sql)
}
