package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 48 (closing sweep): dimension health,
  * repeat-revenue concentration, scalar quantization error, session
  * co-occurrence structure, purchase-cadence segmentation, and graph
  * degree profiles.
  *
  * Numerics: integers and exact-cents ratios except the q333
  * quantization MSE, which follows the q279 double-mean precedent
  * (identical expressions, round(5)). */
object Extras52 extends QueryPack {

  // --------------------------------------------------------------- q331
  /** Supplier-dimension health: per nation, supplier count, negative-
    * balance share, and exact-cents balance quartile spread (integer
    * order statistics, not interpolation). */
  private def q331(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val sup = t("supplier")
      .join(broadcast(t("nation")),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        floor(col("s_acctbal") * 100 + 0.5).as("c"))
    val w = Window.partitionBy("nation").orderBy(col("c"))
    val wn = Window.partitionBy("nation")
    sup
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy("nation")
      .agg(max("n").as("n"),
        sum(when(col("c") < 0, 1L).otherwise(0L)).as("neg"),
        max(when(col("rn") === ceil(col("n") / 4), col("c"))).as("q1"),
        max(when(col("rn") === ceil(col("n") * 3 / 4), col("c")))
          .as("q3"))
      .select(col("nation"), col("n").cast("long").as("n_suppliers"),
        round(col("neg").cast("double") / col("n"), 5).as("neg_share"),
        round((col("q3") - col("q1")).cast("double") / 100, 2)
          .as("iqr_balance"))
      .orderBy("nation")
  }

  private val q331Sql =
    """WITH sup AS (
         SELECT n.n_name AS nation,
                CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS c
         FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey),
       ranked AS (
         SELECT nation, c,
                row_number() OVER (PARTITION BY nation ORDER BY c) AS rn,
                count(*) OVER (PARTITION BY nation) AS n
         FROM sup)
       SELECT nation, CAST(any_value(n) AS BIGINT) AS n_suppliers,
              round(CAST(sum(CASE WHEN c < 0 THEN 1 ELSE 0 END)
                AS DOUBLE) / any_value(n), 5) AS neg_share,
              round(CAST(max(CASE WHEN rn = ceil(n * 3 / 4.0) THEN c END)
                  - max(CASE WHEN rn = ceil(n / 4.0) THEN c END)
                AS DOUBLE) / 100, 2) AS iqr_balance
       FROM ranked GROUP BY nation ORDER BY nation"""

  // --------------------------------------------------------------- q332
  /** Repeat-revenue concentration per year: the share of revenue from
    * customers on their 2nd+ lifetime order — the loyalty-vs-
    * acquisition revenue split, all from one customer-keyed window and
    * exact cents. */
  private def q332(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(year(col("o_orderdate")).as("yr"),
        floor(col("o_totalprice") * 100 + 0.5).as("c"),
        row_number().over(w).as("nth"))
      .groupBy("yr")
      .agg(sum("c").as("total"),
        sum(when(col("nth") >= 2, col("c")).otherwise(0L)).as("rep"),
        count(lit(1)).as("n"),
        sum(when(col("nth") >= 2, 1L).otherwise(0L)).as("n_rep"))
      .select(col("yr").cast("int").as("yr"),
        col("n").cast("long").as("n_orders"),
        round(col("n_rep").cast("double") / col("n"), 5)
          .as("repeat_order_share"),
        round(col("rep").cast("double") / col("total"), 5)
          .as("repeat_revenue_share"))
      .orderBy("yr")
  }

  private val q332Sql =
    """WITH nth AS (
         SELECT CAST(year(o_orderdate) AS INT) AS yr,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
                row_number() OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey) AS nth
         FROM orders)
       SELECT yr, CAST(count(*) AS BIGINT) AS n_orders,
              round(CAST(sum(CASE WHEN nth >= 2 THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*), 5) AS repeat_order_share,
              round(CAST(sum(CASE WHEN nth >= 2 THEN c ELSE 0 END)
                AS DOUBLE) / sum(c), 5) AS repeat_revenue_share
       FROM nth GROUP BY yr ORDER BY yr"""

  // --------------------------------------------------------------- q333
  /** Scalar 8-bit quantization error: each embedding dim quantizes to
    * 256 uniform levels over its own [min, max]; per label the
    * reconstruction RMSE — the "is SQ8 good enough or do we need PQ"
    * table (q115's product quantizer is the heavier alternative).
    * Quantization indices are floors of identical double expressions;
    * the RMSE mean follows the q279 round(5) precedent. */
  private def q333(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("embeddings")
    val flat = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("v", col("v").cast("double"))
    val rng = flat.groupBy("dim")
      .agg(min("v").as("lo"), max("v").as("hi"))
    val q = flat.join(broadcast(rng), "dim")
      .withColumn("step", (col("hi") - col("lo")) / 255)
      .withColumn("code",
        least(floor((col("v") - col("lo")) / col("step")), lit(255.0)))
      .withColumn("rec", col("lo") + col("code") * col("step"))
      .withColumn("e2", (col("v") - col("rec")) * (col("v") - col("rec")))
    q.groupBy("label")
      .agg(count(lit(1)).as("n_values"),
        round(sqrt(avg("e2")), 5).as("rmse"))
      .select(col("label"), col("n_values").cast("long").as("n_values"),
        col("rmse"))
      .orderBy("label")
  }

  private val q333Sql =
    """WITH flat AS (
         SELECT vec_id, label, t.dim,
                CAST(embedding[t.dim + 1] AS DOUBLE) AS v
         FROM embeddings, unnest(range(len(embedding))) AS t(dim)),
       rng AS (SELECT dim, min(v) AS lo, max(v) AS hi
               FROM flat GROUP BY 1),
       q AS (
         SELECT label,
                (v - (lo + least(floor((v - lo) / ((hi - lo) / 255)),
                  CAST(255 AS DOUBLE)) * ((hi - lo) / 255)))
                * (v - (lo + least(floor((v - lo) / ((hi - lo) / 255)),
                  CAST(255 AS DOUBLE)) * ((hi - lo) / 255))) AS e2
         FROM flat JOIN rng USING (dim))
       SELECT label, CAST(count(*) AS BIGINT) AS n_values,
              round(sqrt(avg(e2)), 5) AS rmse
       FROM q GROUP BY label ORDER BY label"""

  // --------------------------------------------------------------- q334
  /** Event-type co-occurrence within sessions: for every type pair,
    * the number of 30-min sessions containing both and the Jaccard
    * overlap of their session sets — which behaviors travel together.
    * Integer set algebra on the q322 islands. */
  private def q334(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val sess = e
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(w)
          > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("sid"), col("event_type")).distinct()
    val cnt = sess.groupBy(col("event_type").as("t"))
      .agg(count(lit(1)).as("nt"))
    val pairs = sess.as("a").join(sess.as("b"),
        col("a.user_id") === col("b.user_id")
          && col("a.sid") === col("b.sid")
          && col("a.event_type") < col("b.event_type"))
      .groupBy(col("a.event_type").as("ta"), col("b.event_type").as("tb"))
      .agg(count(lit(1)).as("both"))
    pairs
      .join(broadcast(cnt.select(col("t").as("ta"), col("nt").as("na"))),
        Seq("ta"))
      .join(broadcast(cnt.select(col("t").as("tb"), col("nt").as("nb"))),
        Seq("tb"))
      .select(col("ta"), col("tb"), col("both").cast("long").as("n_both"),
        round(col("both").cast("double")
          / (col("na") + col("nb") - col("both")), 5).as("jaccard"))
      .orderBy("ta", "tb")
  }

  private val q334Sql =
    """WITH marked AS (
         SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 1800 * 1000000
                     THEN 1 ELSE 0 END AS brk
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT DISTINCT user_id, event_type,
                sum(brk) OVER (PARTITION BY user_id
                  ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM marked),
       cnt AS (SELECT event_type AS t, count(*) AS nt
               FROM sess GROUP BY 1),
       pairs AS (
         SELECT a.event_type AS ta, b.event_type AS tb,
                count(*) AS nb2
         FROM sess a JOIN sess b
           ON a.user_id = b.user_id AND a.sid = b.sid
             AND a.event_type < b.event_type
         GROUP BY 1, 2)
       SELECT ta, tb, CAST(nb2 AS BIGINT) AS n_both,
              round(CAST(nb2 AS DOUBLE)
                / (ca.nt + cb.nt - nb2), 5) AS jaccard
       FROM pairs JOIN cnt ca ON pairs.ta = ca.t
                  JOIN cnt cb ON pairs.tb = cb.t
       ORDER BY ta, tb"""

  // --------------------------------------------------------------- q335
  /** Purchase-cadence segmentation: per customer the coefficient of
    * variation of inter-order gaps (exact integer day sums, closed-
    * form variance), bucketed into regular / loose / erratic segments
    * — counts and mean gap per segment. The CV threshold compares
    * identical doubles derived from integers. */
  private def q335(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = o.select(col("o_custkey"),
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)).as("gap"))
      .filter(col("gap").isNotNull)
    val per = gaps.groupBy("o_custkey")
      .agg(count(lit(1)).as("g"), sum("gap").as("sm"),
        sum(col("gap") * col("gap")).as("qq"))
      .filter(col("g") >= 3)
      .withColumn("cv",
        sqrt((col("g") * col("qq") - col("sm") * col("sm"))
          .cast("double") / (col("g") * (col("g") - 1)))
          / (col("sm").cast("double") / col("g")))
    per.select(
        when(col("cv") < 0.5, "a_regular")
          .when(col("cv") < 1.0, "b_loose")
          .otherwise("c_erratic").as("segment"),
        col("sm"), col("g"))
      .groupBy("segment")
      .agg(count(lit(1)).as("n_customers"),
        round(sum("sm").cast("double") / sum("g"), 4).as("mean_gap_days"))
      .select(col("segment"),
        col("n_customers").cast("long").as("n_customers"),
        col("mean_gap_days"))
      .orderBy("segment")
  }

  private val q335Sql =
    """WITH gaps AS (
         SELECT o_custkey,
                datediff('day', lag(o_orderdate) OVER w, o_orderdate)
                  AS gap
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey)),
       per AS (
         SELECT o_custkey, count(*) AS g, sum(gap) AS sm,
                sum(gap * gap) AS qq
         FROM gaps WHERE gap IS NOT NULL
         GROUP BY 1 HAVING count(*) >= 3),
       cv AS (
         SELECT sm, g,
                sqrt(CAST(g * qq - sm * sm AS DOUBLE) / (g * (g - 1)))
                  / (CAST(sm AS DOUBLE) / g) AS cv
         FROM per)
       SELECT CASE WHEN cv < 0.5 THEN 'a_regular'
                   WHEN cv < 1.0 THEN 'b_loose'
                   ELSE 'c_erratic' END AS segment,
              CAST(count(*) AS BIGINT) AS n_customers,
              round(CAST(sum(sm) AS DOUBLE) / sum(g), 4) AS mean_gap_days
       FROM cv GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q336
  /** Degree profile of the nation trade graph (the q133/q291 graph):
    * per node its weighted degree and neighbor count, plus the graph
    * density row the community queries contextualize against. Pure
    * integer reduces. */
  private def q336(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val e0 = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
    val sym = e0.select(col("src"), col("dst"), col("w"))
      .union(e0.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      .groupBy("src", "dst").agg(sum("w").as("w"))
    sym.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("degree"), sum("w").as("wdeg"))
      .select(col("node").cast("long").as("node"),
        col("degree").cast("long").as("degree"),
        col("wdeg").cast("long").as("weighted_degree"))
      .orderBy("node")
  }

  private val q336Sql =
    """WITH e0 AS (
         SELECT c.c_nationkey AS src, s.s_nationkey AS dst,
                count(*) AS w
         FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
         WHERE c.c_nationkey <> s.s_nationkey
         GROUP BY 1, 2),
       sym AS (
         SELECT src, dst, sum(w) AS w FROM (
           SELECT src, dst, w FROM e0
           UNION ALL SELECT dst, src, w FROM e0)
         GROUP BY 1, 2)
       SELECT CAST(src AS BIGINT) AS node,
              CAST(count(*) AS BIGINT) AS degree,
              CAST(sum(w) AS BIGINT) AS weighted_degree
       FROM sym GROUP BY src ORDER BY node"""

  override def queries: Map[String, QueryFn] = Map(
    "q331_supplier_health"  -> q331 _,
    "q332_repeat_revenue"   -> q332 _,
    "q333_sq8_error"        -> q333 _,
    "q334_type_cooccurrence" -> q334 _,
    "q335_cadence_segments" -> q335 _,
    "q336_graph_degree"     -> q336 _)

  override def oracles: Map[String, String] = Map(
    "q331_supplier_health"  -> q331Sql,
    "q332_repeat_revenue"   -> q332Sql,
    "q333_sq8_error"        -> q333Sql,
    "q334_type_cooccurrence" -> q334Sql,
    "q335_cadence_segments" -> q335Sql,
    "q336_graph_degree"     -> q336Sql)
}
