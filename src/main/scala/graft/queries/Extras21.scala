package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 17: calendar-effect ratios, SLA attainment,
  * period-over-period quartile transitions, lexical diversity, and
  * market-concentration indices.
  */
object Extras21 extends QueryPack {

  // --------------------------------------------------------------- q191
  /** Weekend-vs-weekday revenue effect per order priority: conditional
    * aggregates off one map-side day-of-week flag, reported as a
    * per-day-rate ratio (5 weekdays vs 2 weekend days). */
  private def q191(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    o.withColumn("wk", dayofweek(col("o_orderdate")).isin(1, 7))
      .groupBy("o_orderpriority")
      .agg(
        round(sum(when(col("wk"), col("o_totalprice"))), 2).as("weekend_rev"),
        round(sum(when(!col("wk"), col("o_totalprice"))), 2).as("weekday_rev"),
        round((sum(when(col("wk"), col("o_totalprice"))) / 2) /
              (sum(when(!col("wk"), col("o_totalprice"))) / 5), 6)
          .as("weekend_rate_ratio"))
      .orderBy("o_orderpriority")
  }

  private val q191Sql =
    """SELECT o_orderpriority,
              round(sum(CASE WHEN wk THEN o_totalprice END), 2) AS weekend_rev,
              round(sum(CASE WHEN NOT wk THEN o_totalprice END), 2)
                AS weekday_rev,
              round((sum(CASE WHEN wk THEN o_totalprice END) / 2)
                    / (sum(CASE WHEN NOT wk THEN o_totalprice END) / 5), 6)
                AS weekend_rate_ratio
       FROM (SELECT o_orderpriority, o_totalprice,
                    dayofweek(o_orderdate) IN (6, 0) AS wk
             FROM orders) x
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q192
  /** Shipping-SLA attainment: fraction of lines shipped within 30/60/90
    * days of order date, per priority — three thresshold rates from ONE
    * co-partitioned fact-fact join and one aggregate. */
  private def q192(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t("lineitem").join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .withColumn("lat",
        datediff(to_date(col("l_shipdate")), to_date(col("o_orderdate"))))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n"),
           round(avg(when(col("lat") <= 30, 1).otherwise(0)), 6).as("sla30"),
           round(avg(when(col("lat") <= 60, 1).otherwise(0)), 6).as("sla60"),
           round(avg(when(col("lat") <= 90, 1).otherwise(0)), 6).as("sla90"))
      .orderBy("o_orderpriority")
  }

  private val q192Sql =
    """SELECT o_orderpriority, count(*) AS n,
              round(avg(CASE WHEN lat <= 30 THEN 1 ELSE 0 END), 6) AS sla30,
              round(avg(CASE WHEN lat <= 60 THEN 1 ELSE 0 END), 6) AS sla60,
              round(avg(CASE WHEN lat <= 90 THEN 1 ELSE 0 END), 6) AS sla90
       FROM (SELECT o_orderpriority,
                    datediff('day', CAST(o_orderdate AS DATE),
                             CAST(l_shipdate AS DATE)) AS lat
             FROM lineitem JOIN orders ON l_orderkey = o_orderkey) x
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q193
  /** Customer-value quartile TRANSITION matrix: quartile in the first
    * half of the date range vs quartile in the second half — the churn/
    * upsell migration report. Two period reduces, two ntile windows,
    * one inner join at customer grain, one 16-cell rollup. */
  private def q193(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val mid = lit("1998-01-01").cast("date")
    def half(cond: org.apache.spark.sql.Column, name: String) = {
      o.filter(cond)
        .groupBy("o_custkey").agg(sum("o_totalprice").as("x"))
        .withColumn(name, ntile(4).over(
          Window.orderBy(desc("x"), col("o_custkey"))))
        .select(col("o_custkey"), col(name))
    }
    val h1 = half(to_date(col("o_orderdate")) < mid, "q_before")
    val h2 = half(to_date(col("o_orderdate")) >= mid, "q_after")
    h1.join(h2, "o_custkey")
      .groupBy("q_before", "q_after")
      .agg(count(lit(1)).as("n_customers"))
      .orderBy("q_before", "q_after")
  }

  private val q193Sql =
    """WITH h1 AS (
         SELECT o_custkey,
                ntile(4) OVER (ORDER BY sum(o_totalprice) DESC, o_custkey)
                  AS q_before
         FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1998-01-01'
         GROUP BY o_custkey),
       h2 AS (
         SELECT o_custkey,
                ntile(4) OVER (ORDER BY sum(o_totalprice) DESC, o_custkey)
                  AS q_after
         FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1998-01-01'
         GROUP BY o_custkey)
       SELECT q_before, q_after, count(*) AS n_customers
       FROM h1 JOIN h2 USING (o_custkey)
       GROUP BY 1, 2 ORDER BY 1, 2"""

  // --------------------------------------------------------------- q194
  /** Lexical diversity (type-token ratio) per source: distinct tokens /
    * total tokens per document, averaged per source. The per-doc
    * distinct runs inside one (doc, token) reduce — no corpus-wide
    * vocabulary needed. */
  private def q194(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val toks = d.select(col("doc_id"), col("source"),
        explode(split(lower(col("text")), "[^a-z]+")).as("tok"))
      .filter(col("tok") =!= "")
    val perDoc = toks.groupBy("doc_id", "source")
      .agg(count(lit(1)).as("n_tok"),
           count_distinct(col("tok")).as("n_types"))
    perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("n_types") / col("n_tok").cast("double")), 6)
             .as("avg_ttr"))
      .orderBy("source")
  }

  private val q194Sql =
    """WITH toks AS (
         SELECT doc_id, source, tok
         FROM documents,
              unnest(string_split_regex(lower(text), '[^a-z]+')) AS u(tok)
         WHERE tok <> ''),
       per_doc AS (
         SELECT doc_id, source, count(*) AS n_tok,
                count(DISTINCT tok) AS n_types
         FROM toks GROUP BY 1, 2)
       SELECT source, count(*) AS n_docs,
              round(avg(n_types / n_tok::DOUBLE), 6) AS avg_ttr
       FROM per_doc GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q195
  /** Supplier-concentration HHI per nation: sum of squared revenue
    * shares — the antitrust-style concentration index. Supplier reduce,
    * share window per nation, one squared-sum rollup. */
  private def q195(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val rev = t("lineitem")
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey"), col("s_suppkey"))
      .agg(sum(col("l_extendedprice") * (lit(1) - col("l_discount")))
        .as("rev"))
    val wNation = Window.partitionBy("s_nationkey")
    rev
      .withColumn("share", col("rev") / sum("rev").over(wNation))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
           round(sum(col("share") * col("share")), 6).as("hhi"))
      .orderBy("s_nationkey")
  }

  private val q195Sql =
    """WITH rev AS (
         SELECT s_nationkey, s_suppkey,
                sum(l_extendedprice * (1 - l_discount)) AS rev
         FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
         GROUP BY 1, 2),
       shares AS (
         SELECT s_nationkey,
                rev / sum(rev) OVER (PARTITION BY s_nationkey) AS share
         FROM rev)
       SELECT s_nationkey, count(*) AS n_suppliers,
              round(sum(share * share), 6) AS hhi
       FROM shares GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q191_weekend_effect"  -> q191 _,
    "q192_shipping_sla"    -> q192 _,
    "q193_quartile_flow"   -> q193 _,
    "q194_lexical_diversity" -> q194 _,
    "q195_supplier_hhi"    -> q195 _)

  override def oracles: Map[String, String] = Map(
    "q191_weekend_effect"  -> q191Sql,
    "q192_shipping_sla"    -> q192Sql,
    "q193_quartile_flow"   -> q193Sql,
    "q194_lexical_diversity" -> q194Sql,
    "q195_supplier_hhi"    -> q195Sql)
}
