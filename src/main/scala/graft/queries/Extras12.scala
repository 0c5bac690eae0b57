package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 8: equi-depth histograms, inequality metrics,
  * conversion-latency distribution, ABC classification, and transition
  * matrices.
  */
object Extras12 extends QueryPack {

  // --------------------------------------------------------------- q148
  /** Equi-depth histogram: 10 buckets of (approximately) equal row
    * count over extended price, reporting each bucket's bounds and
    * mass. The equi-depth split reproduces ntile's remainder rule in
    * integer arithmetic over a DISTRIBUTED global index
    * ([[graft.operators.RowIndexer]]: range shuffle + local sort +
    * partition-offset stamp) instead of `ntile() OVER (ORDER BY ...)`
    * — the empty-partitionSpec window would sort the whole lineitem
    * grain on ONE task. ntile's contract: with n rows and k buckets,
    * the first n mod k buckets hold ⌈n/k⌉ rows, the rest ⌊n/k⌋; that
    * is pure (idx, n) arithmetic, so the boundaries are bit-identical
    * to the oracle's ntile. The one driver-side value is the scalar
    * row count (bounded by construction — the Curriculum precedent);
    * the sketch twin q351 remains the declared approximate path. */
  private def q148(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RowIndexer
    val li = Tables(s, dir)("lineitem")
      .select(col("l_extendedprice").as("p"), col("l_orderkey"),
        col("l_linenumber"))
    val n = li.count()
    RowIndexer.stableIndex(li,
        Seq(col("p"), col("l_orderkey"), col("l_linenumber")))
      .withColumn("bucket", RowIndexer.ntileBucket("idx", n, 10))
      .groupBy("bucket")
      // mean over exact integer cents (q316 precedent), not avg(p):
      // a cross-partition double sum is fold-order-dependent and the
      // distributed index no longer feeds the agg in one sorted stream
      .agg(round(min("p"), 2).as("lo"), round(max("p"), 2).as("hi"),
           count(lit(1)).as("n"),
           round(sum(floor(col("p") * 100 + 0.5).cast("long"))
             .cast("double") / (count(lit(1)) * 100), 4).as("mean_p"))
      .orderBy("bucket")
  }

  private val q148Sql =
    """WITH b AS (
         SELECT l_extendedprice AS p,
                ntile(10) OVER (ORDER BY l_extendedprice, l_orderkey,
                                l_linenumber) AS bucket
         FROM lineitem)
       SELECT bucket, round(min(p), 2) AS lo, round(max(p), 2) AS hi,
              count(*) AS n,
              round(CAST(sum(CAST(floor(p * 100 + 0.5) AS BIGINT))
                AS DOUBLE) / (count(*) * 100), 4) AS mean_p
       FROM b GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q149
  /** Gini coefficient of customer spend: the discrete formula
    * G = (2·Σ i·xᵢ)/(n·Σ xᵢ) − (n+1)/n over rank-ordered totals.
    * One customer-grain reduce, one rank window over the reduced set,
    * one scalar fold — inequality metrics as three shuffles of
    * ever-shrinking data. */
  private def q149(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val spend = o.groupBy(col("o_custkey"))
      .agg(sum(col("o_totalprice")).as("x"))
    val w = Window.orderBy(col("x"), col("o_custkey"))
    spend.withColumn("i", row_number().over(w))
      .agg(
        round(
          lit(2) * sum(col("i") * col("x")) /
            (count(lit(1)) * sum(col("x"))) -
          (count(lit(1)) + lit(1)).cast("double") / count(lit(1)), 6)
          .as("gini"),
        count(lit(1)).as("n_customers"))
  }

  private val q149Sql =
    """WITH spend AS (
         SELECT o_custkey, sum(o_totalprice) AS x FROM orders GROUP BY 1),
       ranked AS (
         SELECT x, row_number() OVER (ORDER BY x, o_custkey) AS i FROM spend)
       SELECT round(2 * sum(i * x) / (count(*) * sum(x))
                    - (count(*) + 1)::DOUBLE / count(*), 6) AS gini,
              count(*) AS n_customers
       FROM ranked"""

  // --------------------------------------------------------------- q150
  /** Conversion-latency distribution: minutes from first signup to
    * first later purchase per user, summarized as exact quartiles.
    * The per-user reduce keeps the percentile input at user grain. */
  private def q150(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val sg = e.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min("ts").as("s_ts"))
    val pu = e.filter(col("event_type") === "purchase")
      .join(sg, "user_id").filter(col("ts") > col("s_ts"))
      .groupBy("user_id").agg(min("ts").as("p_ts"))
    val lat = sg.join(pu, "user_id")
      .select((unix_micros(col("p_ts")) - unix_micros(col("s_ts")))
        .cast("double")./(lit(60e6)).as("mins"))
    lat.agg(
      count(lit(1)).as("n_converted"),
      round(expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY mins)"), 4).as("p25"),
      round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY mins)"), 4).as("p50"),
      round(expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY mins)"), 4).as("p75"),
      round(avg("mins"), 4).as("mean_mins"))
  }

  private val q150Sql =
    """WITH sg AS (
         SELECT user_id, min(ts) AS s_ts FROM events
         WHERE event_type = 'signup' GROUP BY 1),
       pu AS (
         SELECT e.user_id, min(e.ts) AS p_ts
         FROM events e JOIN sg ON e.user_id = sg.user_id
         WHERE e.event_type = 'purchase' AND e.ts > sg.s_ts GROUP BY 1),
       lat AS (
         SELECT (epoch_us(p_ts) - epoch_us(s_ts))::DOUBLE / 60000000 AS mins
         FROM sg JOIN pu ON sg.user_id = pu.user_id)
       SELECT count(*) AS n_converted,
              round(percentile_cont(0.25) WITHIN GROUP (ORDER BY mins), 4) AS p25,
              round(percentile_cont(0.5) WITHIN GROUP (ORDER BY mins), 4) AS p50,
              round(percentile_cont(0.75) WITHIN GROUP (ORDER BY mins), 4) AS p75,
              round(avg(mins), 4) AS mean_mins
       FROM lat"""

  // --------------------------------------------------------------- q151
  /** ABC inventory classification: parts ranked by revenue, classed A
    * (top 70% of cumulative revenue), B (to 90%), C (rest). Cumulative
    * share is one window over the part-grain reduce; the class rollup
    * is a 3-row hash agg. */
  private def q151(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir)("lineitem")
    val rev = li.groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("rev"))
    val wCum = Window.orderBy(desc("rev"), col("l_partkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy()
    rev
      .withColumn("cum_share", sum("rev").over(wCum) / sum("rev").over(wAll))
      .withColumn("cls",
        when(col("cum_share") <= 0.7, "A")
          .when(col("cum_share") <= 0.9, "B").otherwise("C"))
      .groupBy("cls")
      .agg(count(lit(1)).as("n_parts"), round(sum("rev"), 2).as("class_rev"))
      .orderBy("cls")
  }

  private val q151Sql =
    """WITH rev AS (
         SELECT l_partkey, sum(l_extendedprice * (1 - l_discount)) AS rev
         FROM lineitem GROUP BY 1),
       cum AS (
         SELECT l_partkey, rev,
                sum(rev) OVER (ORDER BY rev DESC, l_partkey
                               ROWS UNBOUNDED PRECEDING)
                  / sum(rev) OVER () AS cum_share
         FROM rev)
       SELECT CASE WHEN cum_share <= 0.7 THEN 'A'
                   WHEN cum_share <= 0.9 THEN 'B' ELSE 'C' END AS cls,
              count(*) AS n_parts, round(sum(rev), 2) AS class_rev
       FROM cum GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q152
  /** Row-stochastic transition matrix over per-user event-type
    * bigrams: P(next=b | cur=a). The bigram count is q136's shuffle;
    * the normalization is a partition-local window over the tiny
    * (types × types) matrix. */
  private def q152(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val big = e.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur"),
        lead(col("event_type"), 1).over(w).as("nxt"))
      .filter(col("nxt").isNotNull)
      .groupBy("cur", "nxt").agg(count(lit(1)).as("n"))
    val wRow = Window.partitionBy("cur")
    big.withColumn("p", round(col("n") / sum("n").over(wRow), 6))
      .orderBy("cur", "nxt")
  }

  private val q152Sql =
    """WITH p AS (
         SELECT event_type AS cur,
                lead(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS nxt
         FROM events),
       big AS (
         SELECT cur, nxt, count(*) AS n FROM p
         WHERE nxt IS NOT NULL GROUP BY 1, 2)
       SELECT cur, nxt, n,
              round(n / sum(n) OVER (PARTITION BY cur), 6) AS p
       FROM big ORDER BY cur, nxt"""

  override def queries: Map[String, QueryFn] = Map(
    "q148_equidepth"  -> q148 _,
    "q149_gini"       -> q149 _,
    "q150_conv_lat"   -> q150 _,
    "q151_abc"        -> q151 _,
    "q152_transition" -> q152 _)

  override def oracles: Map[String, String] = Map(
    "q148_equidepth"  -> q148Sql,
    "q149_gini"       -> q149Sql,
    "q150_conv_lat"   -> q150Sql,
    "q151_abc"        -> q151Sql,
    "q152_transition" -> q152Sql)
}
