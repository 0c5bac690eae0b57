package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Skyline

/** Round-4 surface, part 7: Pareto frontier, share-of-total windows,
  * YoY trend, activity-gap mining, and BM25 relevance scoring.
  */
object Extras11 extends QueryPack {

  // --------------------------------------------------------------- q143
  /** 2-D skyline: parts on the (size, price) Pareto frontier — no other
    * part is both smaller and cheaper (one strict). `Skyline.skyline2D`
    * runs it as one sort + range-framed window instead of the oracle's
    * quadratic NOT EXISTS self-join; the local-prune pass bounds the
    * global window input at scale. */
  private def q143(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir)("part")
      .select(col("p_partkey"), col("p_size"), col("p_retailprice"))
    Skyline.skyline2D(p, "p_size", "p_retailprice")
      .orderBy("p_size", "p_retailprice", "p_partkey")
  }

  private val q143Sql =
    """SELECT p_partkey, p_size, p_retailprice
       FROM part a
       WHERE NOT EXISTS (
         SELECT 1 FROM part b
         WHERE b.p_size <= a.p_size AND b.p_retailprice <= a.p_retailprice
           AND (b.p_size < a.p_size OR b.p_retailprice < a.p_retailprice))
       ORDER BY p_size, p_retailprice, p_partkey"""

  // --------------------------------------------------------------- q144
  /** Share-of-total contribution: each nation's revenue as a fraction
    * of the global total, with running cumulative share in revenue
    * order — the ratio_to_report pattern. Both windows run over the
    * 25-row nation aggregate, not the fact table. */
  private def q144(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val rev = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("revenue"))
    val wAll = Window.partitionBy()
    val wCum = Window.orderBy(desc("revenue"), col("nation"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rev
      .withColumn("share", round(col("revenue") / sum("revenue").over(wAll), 6))
      .withColumn("cum_share",
        round(sum("revenue").over(wCum) / sum("revenue").over(wAll), 6))
      .select(col("nation"), round(col("revenue"), 2).as("revenue"),
        col("share"), col("cum_share"))
      .orderBy(desc("revenue"), col("nation"))
  }

  private val q144Sql =
    """WITH rev AS (
         SELECT n_name AS nation,
                sum(l_extendedprice * (1 - l_discount)) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY 1)
       SELECT nation, round(revenue, 2) AS revenue,
              round(revenue / sum(revenue) OVER (), 6) AS share,
              round(sum(revenue) OVER (ORDER BY revenue DESC, nation
                                       ROWS UNBOUNDED PRECEDING)
                    / sum(revenue) OVER (), 6) AS cum_share
       FROM rev ORDER BY revenue DESC, nation"""

  // --------------------------------------------------------------- q145
  /** Year-over-year growth: monthly order revenue vs the same month one
    * year earlier (lag 12 over the month spine). The window input is
    * the monthly aggregate (~80 rows), so the global order-by window is
    * free; the heavy lifting is the one month-keyed hash aggregate. */
  private def q145(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val monthly = o.groupBy(
        year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(round(sum(col("o_totalprice")), 2).as("revenue"))
    val w = Window.orderBy("y", "m")
    monthly
      .withColumn("prev_year", lag(col("revenue"), 12).over(w))
      .withColumn("yoy_pct",
        round((col("revenue") - col("prev_year")) / col("prev_year") * 100, 4))
      .orderBy("y", "m")
  }

  private val q145Sql =
    """WITH monthly AS (
         SELECT year(o_orderdate) AS y, month(o_orderdate) AS m,
                round(sum(o_totalprice), 2) AS revenue
         FROM orders GROUP BY 1, 2)
       SELECT y, m, revenue,
              lag(revenue, 12) OVER (ORDER BY y, m) AS prev_year,
              round((revenue - lag(revenue, 12) OVER (ORDER BY y, m))
                    / lag(revenue, 12) OVER (ORDER BY y, m) * 100, 4) AS yoy_pct
       FROM monthly ORDER BY y, m"""

  // --------------------------------------------------------------- q146
  /** Activity-gap mining: the dual of q137's islands — for each user,
    * the silent stretches BETWEEN active days, as a gap-length
    * histogram. lag() over the distinct-day stream yields each gap in
    * one user-keyed pass; no calendar spine join needed. */
  private def q146(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val days = e.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    days
      .withColumn("gap", datediff(col("d"), lag(col("d"), 1).over(w)) - 1)
      .filter(col("gap") > 0)
      .groupBy(col("gap").as("gap_days"))
      .agg(count(lit(1)).as("n_gaps"),
           count_distinct(col("user_id")).as("n_users"))
      .orderBy("gap_days")
  }

  private val q146Sql =
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       gaps AS (
         SELECT user_id,
                datediff('day', lag(d) OVER (PARTITION BY user_id ORDER BY d),
                         d) - 1 AS gap
         FROM days)
       SELECT gap AS gap_days, count(*) AS n_gaps,
              count(DISTINCT user_id) AS n_users
       FROM gaps WHERE gap > 0 GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q147
  /** BM25 relevance: score documents against a fixed term set with the
    * classic (k1=1.2, b=0.75) formulation. Tokenization is one regex
    * split shared verbatim with the oracle; document stats and term
    * stats are two hash aggregates, and the scoring join touches only
    * rows whose token matches a query term — the inverted-index
    * access pattern, expressed relationally. */
  private def q147(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val terms = Seq("data", "model", "system")
    val toks = d.select(col("doc_id"),
        explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .filter(col("tok") =!= "")
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val nDocs = d.count()
    val avgdl = toks.count().toDouble / nDocs
    val tf = toks.filter(col("tok").isin(terms: _*))
      .groupBy("doc_id", "tok").agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy("tok").agg(count_distinct(col("doc_id")).as("df"))
    val k1 = 1.2; val b = 0.75
    tf.join(broadcast(df_), "tok").join(dl, "doc_id")
      .withColumn("idf",
        log((lit(nDocs) - col("df") + 0.5) / (col("df") + 0.5) + 1))
      .withColumn("s",
        col("idf") * col("tf") * (k1 + 1) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("dl") / avgdl)))
      .groupBy("doc_id").agg(round(sum("s"), 6).as("bm25"))
      .orderBy(desc("bm25"), col("doc_id")).limit(20)
  }

  private val q147Sql =
    """WITH toks AS (
         SELECT doc_id, tok
         FROM documents,
              unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(tok)
         WHERE tok <> ''),
       dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
       consts AS (
         SELECT (SELECT count(*) FROM documents) AS n_docs,
                (SELECT count(*) FROM toks)::DOUBLE
                  / (SELECT count(*) FROM documents) AS avgdl),
       tf AS (
         SELECT doc_id, tok, count(*) AS tf FROM toks
         WHERE tok IN ('data', 'model', 'system') GROUP BY 1, 2),
       df AS (SELECT tok, count(DISTINCT doc_id) AS df FROM tf GROUP BY 1)
       SELECT tf.doc_id, round(sum(
                ln((consts.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
                * tf.tf * 2.2
                / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / consts.avgdl))), 6)
                AS bm25
       FROM tf, consts
       JOIN df ON tf.tok = df.tok
       JOIN dl ON tf.doc_id = dl.doc_id
       GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 20"""

  override def queries: Map[String, QueryFn] = Map(
    "q143_skyline" -> q143 _,
    "q144_share"   -> q144 _,
    "q145_yoy"     -> q145 _,
    "q146_gaps"    -> q146 _,
    "q147_bm25"    -> q147 _)

  override def oracles: Map[String, String] = Map(
    "q143_skyline" -> q143Sql,
    "q144_share"   -> q144Sql,
    "q145_yoy"     -> q145Sql,
    "q146_gaps"    -> q146Sql,
    "q147_bm25"    -> q147Sql)
}
