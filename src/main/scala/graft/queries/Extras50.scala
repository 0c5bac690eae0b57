package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 46: embedding stability and outliers, column
  * health screening, calendar-shape revenue checks, session outcome
  * mix, and monthly growth accounting — the recurring dashboards of a
  * data platform, each in its scale-correct shape.
  *
  * Numerics: integer set logic and exact-cents ratios everywhere;
  * embedding statistics (double means/distances) follow the q279
  * centroid precedent — identical expressions both engines, round(5)
  * on output. */
object Extras50 extends QueryPack {

  // --------------------------------------------------------------- q319
  /** Embedding-centroid stability: vectors split into two halves by
    * vec_id parity; per label, the euclidean distance between the
    * half-centroids. Near-zero distances mean the label geometry is
    * sample-stable; a large one flags a heterogeneous or drifting
    * label. Same flat (id, dim, v) grain as q279. */
  private def q319(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("embeddings")
    val flat = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("v", col("v").cast("double"))
      .withColumn("half", pmod(col("vec_id"), lit(2)))
    val cent = flat.groupBy("label", "dim")
      .agg(avg(when(col("half") === 0, col("v"))).as("m0"),
        avg(when(col("half") === 1, col("v"))).as("m1"),
        sum(when(col("half") === 0, 1L).otherwise(0L)).as("n0"),
        sum(when(col("half") === 1, 1L).otherwise(0L)).as("n1"))
    // n0/n1 are per-(label,dim) vector counts — identical across dims,
    // so max() just collapses the 64 copies
    cent.groupBy("label")
      .agg(max(col("n0")).as("n_a"),
        max(col("n1")).as("n_b"),
        round(sqrt(sum((col("m0") - col("m1"))
          * (col("m0") - col("m1")))), 5).as("centroid_shift"))
      .select(col("label"), col("n_a").cast("long").as("n_half_a"),
        col("n_b").cast("long").as("n_half_b"), col("centroid_shift"))
      .orderBy("label")
  }

  private val q319Sql =
    """WITH flat AS (
         SELECT vec_id, label, t.dim,
                CAST(embedding[t.dim + 1] AS DOUBLE) AS v,
                vec_id % 2 AS half
         FROM embeddings, unnest(range(len(embedding))) AS t(dim)),
       cent AS (
         SELECT label, dim,
                avg(CASE WHEN half = 0 THEN v END) AS m0,
                avg(CASE WHEN half = 1 THEN v END) AS m1,
                sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS n0,
                sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS n1
         FROM flat GROUP BY 1, 2)
       SELECT label,
              CAST(max(n0) AS BIGINT) AS n_half_a,
              CAST(max(n1) AS BIGINT) AS n_half_b,
              round(sqrt(sum((m0 - m1) * (m0 - m1))), 5)
                AS centroid_shift
       FROM cent GROUP BY label ORDER BY label"""

  // --------------------------------------------------------------- q320
  /** Column-health screen: for the numeric columns a pipeline keys
    * decisions on, n / distinct / coefficient of variation from the
    * all-integer (g·Q−S²) identity over quantized units (cents,
    * permille, whole units) — near-constant columns flagged. The
    * variance never touches a float accumulator. */
  private def q320(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    def screen(df: DataFrame, table: String, column: String,
               quant: org.apache.spark.sql.Column): DataFrame = {
      // sums of squared cents overflow Long at sf0.1 — the moment
      // algebra runs in decimal(38,0), exact like DuckDB's HUGEINT,
      // and only the final closed form drops to double
      val q = df.select(quant.cast("decimal(18,0)").as("x"))
      q.agg(count(lit(1)).as("g"), countDistinct("x").as("nd"),
          sum("x").as("s"), sum(col("x") * col("x")).as("qq"))
        .select(lit(table).as("tbl"), lit(column).as("col"),
          col("g").cast("long").as("n"),
          col("nd").cast("long").as("n_distinct"),
          round(sqrt((col("g").cast("decimal(38,0)") * col("qq")
              - col("s").cast("decimal(38,0)") * col("s"))
              .cast("double") / (col("g") * (col("g") - 1)))
            / (col("s").cast("double") / col("g")), 5).as("cv"),
          (col("nd") <= 2).as("near_constant"))
    }
    screen(t("orders"), "orders", "o_totalprice",
        floor(col("o_totalprice") * 100 + 0.5))
      .unionByName(screen(t("lineitem"), "lineitem", "l_quantity",
        col("l_quantity")))
      .unionByName(screen(t("lineitem"), "lineitem", "l_discount",
        floor(col("l_discount") * 100 + 0.5)))
      .unionByName(screen(t("events"), "events", "value",
        floor(col("value") * 100 + 0.5)))
      .orderBy("tbl", "col")
  }

  private val q320Sql = {
    def one(table: String, column: String, quant: String) =
      s"""SELECT '$table' AS tbl, '$column' AS col,
            CAST(count(*) AS BIGINT) AS n,
            CAST(count(DISTINCT $quant) AS BIGINT) AS n_distinct,
            round(sqrt(CAST(count(*) * sum($quant * $quant)
                - sum($quant) * sum($quant) AS DOUBLE)
              / (count(*) * (count(*) - 1)))
              / (CAST(sum($quant) AS DOUBLE) / count(*)), 5) AS cv,
            count(DISTINCT $quant) <= 2 AS near_constant
          FROM $table"""
    Seq(
      one("orders", "o_totalprice",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"),
      one("lineitem", "l_quantity", "CAST(l_quantity AS BIGINT)"),
      one("lineitem", "l_discount",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"),
      one("events", "value",
        "CAST(floor(value * 100 + 0.5) AS BIGINT)"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, col")
  }

  // --------------------------------------------------------------- q321
  /** Month-end spike detector: per year, the share of revenue booked
    * in the last 3 calendar days of any month — one exact-cents ratio
    * per year, the batch-vs-organic smell test on a revenue stream. */
  private def q321(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    o.select(year(col("o_orderdate")).as("yr"),
        floor(col("o_totalprice") * 100 + 0.5).as("c"),
        (datediff(last_day(col("o_orderdate")), col("o_orderdate")) <= 2)
          .as("tail"))
      .groupBy("yr")
      .agg(sum("c").as("total"),
        sum(when(col("tail"), col("c")).otherwise(0L)).as("end3"))
      .select(col("yr").cast("int").as("yr"),
        col("end3").cast("long").as("end3_cents"),
        col("total").cast("long").as("total_cents"),
        round(col("end3").cast("double") / col("total"), 6)
          .as("end3_share"))
      .orderBy("yr")
  }

  private val q321Sql =
    """SELECT CAST(year(o_orderdate) AS INT) AS yr,
              CAST(sum(CASE WHEN datediff('day', o_orderdate,
                  last_day(o_orderdate)) <= 2
                THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                ELSE 0 END) AS BIGINT) AS end3_cents,
              CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents,
              round(CAST(sum(CASE WHEN datediff('day', o_orderdate,
                  last_day(o_orderdate)) <= 2
                THEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                ELSE 0 END) AS DOUBLE)
                / sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)), 6)
                AS end3_share
       FROM orders GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q322
  /** Session outcome mix: 30-minute-gap sessions (the q33 islands) by
    * whether they contain a purchase — session count, mean events,
    * mean duration per outcome. Exact micros sums; integer islands. */
  private def q322(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts"), col("event_id"))
    val marked = e
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(w)
          > 1800L * 1000000L, 1L).otherwise(0L))
      .withColumn("sid", sum("brk").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val sessions = marked.groupBy("user_id", "sid")
      .agg(count(lit(1)).as("n_ev"),
        (max("us") - min("us")).as("dur_us"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    sessions.groupBy("converted")
      .agg(count(lit(1)).as("n_sessions"),
        sum("n_ev").as("tot_ev"), sum("dur_us").as("tot_us"))
      .select(col("converted").cast("int").as("converted"),
        col("n_sessions").cast("long").as("n_sessions"),
        round(col("tot_ev").cast("double") / col("n_sessions"), 4)
          .as("avg_events"),
        round(col("tot_us").cast("double") / col("n_sessions") / 1e6, 4)
          .as("avg_duration_s"))
      .orderBy("converted")
  }

  private val q322Sql =
    """WITH marked AS (
         SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
                CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       > 1800 * 1000000
                     THEN 1 ELSE 0 END AS brk
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id, us, event_type,
                sum(brk) OVER (PARTITION BY user_id
                  ORDER BY us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM marked),
       sessions AS (
         SELECT user_id, sid, count(*) AS n_ev,
                max(us) - min(us) AS dur_us,
                max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS converted
         FROM sess GROUP BY 1, 2)
       SELECT CAST(converted AS INT) AS converted,
              CAST(count(*) AS BIGINT) AS n_sessions,
              round(CAST(sum(n_ev) AS DOUBLE) / count(*), 4) AS avg_events,
              round(CAST(sum(dur_us) AS DOUBLE) / count(*) / 1e6, 4)
                AS avg_duration_s
       FROM sessions GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q323
  /** Embedding outliers: top-20 vectors by euclidean distance to their
    * own label centroid — the "inspect these first" list after any
    * embedding run. Distances are identical double expressions in both
    * engines, so the ranking is rounding-free (q279 grain). */
  private def q323(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("embeddings")
    val flat = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("v", col("v").cast("double"))
    val cent = flat.groupBy(col("label").as("clabel"), col("dim"))
      .agg(avg("v").as("c"))
    flat.join(broadcast(cent),
        col("label") === col("clabel") && flat("dim") === cent("dim"))
      .groupBy("vec_id", "label")
      .agg(sqrt(sum((col("v") - col("c")) * (col("v") - col("c"))))
        .as("dist"))
      .orderBy(col("dist").desc, col("vec_id"))
      .limit(20)
      .select(col("vec_id"), col("label"), round(col("dist"), 5)
        .as("dist_to_centroid"))
  }

  private val q323Sql =
    """WITH flat AS (
         SELECT vec_id, label, t.dim,
                CAST(embedding[t.dim + 1] AS DOUBLE) AS v
         FROM embeddings, unnest(range(len(embedding))) AS t(dim)),
       cent AS (SELECT label, dim, avg(v) AS c
                FROM flat GROUP BY 1, 2),
       d AS (
         SELECT f.vec_id, f.label,
                sqrt(sum((f.v - c.c) * (f.v - c.c))) AS dist
         FROM flat f JOIN cent c
           ON f.label = c.label AND f.dim = c.dim
         GROUP BY 1, 2)
       SELECT vec_id, label, round(dist, 5) AS dist_to_centroid
       FROM d ORDER BY dist DESC, vec_id LIMIT 20"""

  // --------------------------------------------------------------- q324
  /** Monthly growth accounting over the customer base: new, retained,
    * resurrected, churned per month-index plus the quick ratio — the
    * canonical MAU decomposition, all from one distinct
    * (customer, month) grain and a self-join on m−1. Pure integers;
    * division guarded by nullif. */
  private def q324(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val cm = o.select(col("o_custkey").as("ck"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1)
          .as("mi")).distinct()
    val first = cm.groupBy("ck").agg(min("mi").as("fs"))
    val prev = cm.select(col("ck"), (col("mi") + 1).as("mi"))
      .withColumn("p", lit(1))
    val cur = cm.join(first, "ck")
      .join(prev, Seq("ck", "mi"), "left")
      .groupBy("mi")
      .agg(count(lit(1)).as("mau"),
        sum(when(col("fs") === col("mi"), 1L).otherwise(0L)).as("new_u"),
        sum(when(col("p").isNotNull, 1L).otherwise(0L)).as("retained"),
        sum(when(col("p").isNull && col("fs") < col("mi"), 1L)
          .otherwise(0L)).as("resurrected"))
    val churn = cm.select(col("ck"), (col("mi") + 1).as("mi"))
      .join(cm.withColumn("c", lit(1)), Seq("ck", "mi"), "left")
      .groupBy("mi")
      .agg(sum(when(col("c").isNull, 1L).otherwise(0L)).as("churned"))
    cur.join(churn, Seq("mi"), "left")
      .withColumn("churned", coalesce(col("churned"), lit(0L)))
      .select(col("mi").cast("int").as("month_index"),
        col("mau").cast("long").as("mau"),
        col("new_u").cast("long").as("new_customers"),
        col("retained").cast("long").as("retained"),
        col("resurrected").cast("long").as("resurrected"),
        col("churned").cast("long").as("churned"),
        round((col("new_u") + col("resurrected")).cast("double")
          / nullif(col("churned"), lit(0)), 4).as("quick_ratio"))
      .orderBy("month_index")
  }

  private val q324Sql =
    """WITH cm AS (
         SELECT DISTINCT o_custkey AS ck,
                (year(o_orderdate) * 12 + month(o_orderdate) - 1) AS mi
         FROM orders),
       fs AS (SELECT ck, min(mi) AS fs FROM cm GROUP BY 1),
       cur AS (
         SELECT cm.mi, count(*) AS mau,
                sum(CASE WHEN fs.fs = cm.mi THEN 1 ELSE 0 END) AS new_u,
                sum(CASE WHEN p.ck IS NOT NULL THEN 1 ELSE 0 END)
                  AS retained,
                sum(CASE WHEN p.ck IS NULL AND fs.fs < cm.mi
                  THEN 1 ELSE 0 END) AS resurrected
         FROM cm
           JOIN fs ON cm.ck = fs.ck
           LEFT JOIN cm p ON p.ck = cm.ck AND p.mi + 1 = cm.mi
         GROUP BY 1),
       churn AS (
         SELECT a.mi + 1 AS mi,
                sum(CASE WHEN b.ck IS NULL THEN 1 ELSE 0 END) AS churned
         FROM cm a LEFT JOIN cm b
           ON b.ck = a.ck AND b.mi = a.mi + 1
         GROUP BY 1)
       SELECT CAST(cur.mi AS INT) AS month_index,
              CAST(mau AS BIGINT) AS mau,
              CAST(new_u AS BIGINT) AS new_customers,
              CAST(retained AS BIGINT) AS retained,
              CAST(resurrected AS BIGINT) AS resurrected,
              CAST(coalesce(churn.churned, 0) AS BIGINT) AS churned,
              round(CAST(new_u + resurrected AS DOUBLE)
                / nullif(coalesce(churn.churned, 0), 0), 4)
                AS quick_ratio
       FROM cur LEFT JOIN churn ON cur.mi = churn.mi
       ORDER BY month_index"""

  override def queries: Map[String, QueryFn] = Map(
    "q319_centroid_stability" -> q319 _,
    "q320_variance_screen"    -> q320 _,
    "q321_month_end_spike"    -> q321 _,
    "q322_session_outcomes"   -> q322 _,
    "q323_embedding_outliers" -> q323 _,
    "q324_growth_accounting"  -> q324 _)

  override def oracles: Map[String, String] = Map(
    "q319_centroid_stability" -> q319Sql,
    "q320_variance_screen"    -> q320Sql,
    "q321_month_end_spike"    -> q321Sql,
    "q322_session_outcomes"   -> q322Sql,
    "q323_embedding_outliers" -> q323Sql,
    "q324_growth_accounting"  -> q324Sql)
}
