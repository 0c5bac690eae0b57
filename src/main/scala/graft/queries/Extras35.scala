package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 31: nonparametric statistics — Mann-Whitney U,
  * two-sample Kolmogorov-Smirnov, user-set Jaccard overlap, Zipf
  * rank-frequency slope.
  *
  * The rank/ECDF shapes reduce to the distinct-cents GRID first, so the
  * global-order window runs over the value domain (bounded), not the
  * raw events; at 100 TB the same grid would range-partition through
  * `operators.RowIndexer` instead of a single-partition window.
  */
object Extras35 extends QueryPack {

  /** (cents-grain value, per-group counts) grid for the two-sample
    * tests: one shuffle to the value domain, groups as columns. */
  private def grid(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir)("events")
      .filter(col("event_type").isin("click", "view"))
      .select(col("event_type").as("t"),
        floor(col("value") * 100 + 0.5).as("c"))
      .groupBy("c")
      .agg(sum(when(col("t") === "click", 1L).otherwise(0L)).as("n1v"),
        sum(when(col("t") === "view", 1L).otherwise(0L)).as("n2v"))
  }

  // --------------------------------------------------------------- q251
  /** Mann-Whitney U (click vs view): U1 from below-counts over the
    * value grid — sum(n1v * n2_below) plus half-credit for ties — the
    * pair-count formulation that never ranks raw rows. */
  private def q251(s: SparkSession, dir: String): DataFrame = {
    val g = grid(s, dir)
    val below = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = g.agg(sum(col("n1v")).as("n1"), sum(col("n2v")).as("n2"))
    g.withColumn("n2_below",
        coalesce(sum(col("n2v")).over(below), lit(0L)))
      .crossJoin(broadcast(tot))
      .groupBy("n1", "n2")
      .agg(round(sum(col("n1v") * col("n2_below")
        + col("n1v") * col("n2v") / 2.0), 2).as("u1"))
      .select(col("n1"), col("n2"), col("u1"))
  }

  private val q251Sql =
    """WITH pts AS (
         SELECT event_type AS t, floor(value * 100 + 0.5) AS c
         FROM events WHERE event_type IN ('click', 'view')),
       grid AS (
         SELECT c,
                sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS n1v,
                sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END) AS n2v
         FROM pts GROUP BY 1),
       cum AS (
         SELECT c, n1v, n2v,
                coalesce(sum(n2v) OVER (ORDER BY c
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS n2_below
         FROM grid),
       tot AS (SELECT sum(n1v) AS n1, sum(n2v) AS n2 FROM grid)
       SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
              round(sum(n1v * n2_below + n1v * n2v / 2.0), 2) AS u1
       FROM cum CROSS JOIN tot
       GROUP BY n1, n2"""

  // --------------------------------------------------------------- q252
  /** Two-sample Kolmogorov-Smirnov statistic: max ECDF gap over the
    * same grid; cumulative counts divide the broadcast totals, so both
    * ECDFs materialize in one ordered pass. */
  private def q252(s: SparkSession, dir: String): DataFrame = {
    val g = grid(s, dir)
    val cum = Window.orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = g.agg(sum(col("n1v")).as("n1"), sum(col("n2v")).as("n2"))
    g.crossJoin(broadcast(tot))
      .select((sum(col("n1v")).over(cum) / col("n1").cast("double"))
        .as("f1"),
        (sum(col("n2v")).over(cum) / col("n2").cast("double")).as("f2"))
      .agg(round(max(abs(col("f1") - col("f2"))), 6).as("ks_stat"))
  }

  private val q252Sql =
    """WITH pts AS (
         SELECT event_type AS t, floor(value * 100 + 0.5) AS c
         FROM events WHERE event_type IN ('click', 'view')),
       grid AS (
         SELECT c,
                sum(CASE WHEN t = 'click' THEN 1 ELSE 0 END) AS n1v,
                sum(CASE WHEN t = 'view' THEN 1 ELSE 0 END) AS n2v
         FROM pts GROUP BY 1),
       tot AS (SELECT sum(n1v) AS n1, sum(n2v) AS n2 FROM grid),
       ecdf AS (
         SELECT sum(n1v) OVER (ORDER BY c
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  / n1::DOUBLE AS f1,
                sum(n2v) OVER (ORDER BY c
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  / n2::DOUBLE AS f2
         FROM grid CROSS JOIN tot)
       SELECT round(max(abs(f1 - f2)), 6) AS ks_stat FROM ecdf"""

  // --------------------------------------------------------------- q253
  /** Jaccard overlap of USER SETS between event types: the distinct
    * (type, user) reduce self-joins on the user key (t1 < t2 halves the
    * pair space), sizes broadcast back — audience-overlap analysis with
    * exact set arithmetic. */
  private def q253(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val tu = e.select(col("event_type").as("t"), col("user_id").as("u"))
      .distinct()
    val sizes = tu.groupBy("t").agg(count(lit(1)).as("n"))
    val a = tu.select(col("t").as("t1"), col("u"))
    val b = tu.select(col("t").as("t2"), col("u").as("u2"))
    val inter = a.join(b, col("u") === col("u2") && col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(sizes.select(col("t").as("t1"), col("n").as("s1"))),
        "t1")
      .join(broadcast(sizes.select(col("t").as("t2"), col("n").as("s2"))),
        "t2")
      .select(col("t1"), col("t2"), col("n_common"),
        round(col("n_common")
          / (col("s1") + col("s2") - col("n_common")).cast("double"), 6)
          .as("jaccard"))
      .orderBy("t1", "t2")
  }

  private val q253Sql =
    """WITH tu AS (
         SELECT DISTINCT event_type AS t, user_id AS u FROM events),
       sizes AS (SELECT t, count(*) AS n FROM tu GROUP BY 1),
       inter AS (
         SELECT a.t AS t1, b.t AS t2, count(*) AS n_common
         FROM tu a JOIN tu b ON a.u = b.u AND a.t < b.t
         GROUP BY 1, 2)
       SELECT i.t1, i.t2, CAST(i.n_common AS BIGINT) AS n_common,
              round(i.n_common / (s1.n + s2.n - i.n_common)::DOUBLE, 6)
                AS jaccard
       FROM inter i
       JOIN sizes s1 ON s1.t = i.t1
       JOIN sizes s2 ON s2.t = i.t2
       ORDER BY t1, t2"""

  // --------------------------------------------------------------- q254
  /** Zipf rank-frequency slope of the corpus vocabulary: tokenize,
    * count, rank deterministically (freq desc, word), fit ln(freq) on
    * ln(rank) over the head — the corpus-health power-law check. */
  private def q254(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val words = d.select(explode(filter(
      split(lower(col("text")), "[^a-z]+"),
      w => length(w) > 0)).as("w"))
    val freq = words.groupBy("w").agg(count(lit(1)).as("f"))
    val ranked = freq.withColumn("r",
      row_number().over(Window.orderBy(col("f").desc, col("w"))))
    ranked.filter(col("r") <= 200)
      .agg(count(lit(1)).as("n_words"),
        round(regr_slope(log(col("f")), log(col("r"))), 4)
          .as("zipf_slope"))
  }

  private val q254Sql =
    """WITH words AS (
         SELECT unnest(list_filter(
                  string_split_regex(lower(text), '[^a-z]+'),
                  w -> len(w) > 0)) AS w
         FROM documents),
       freq AS (SELECT w, count(*) AS f FROM words GROUP BY 1),
       ranked AS (
         SELECT f, row_number() OVER (ORDER BY f DESC, w) AS r
         FROM freq)
       SELECT count(*) AS n_words,
              round(regr_slope(ln(f), ln(r)), 4) AS zipf_slope
       FROM ranked WHERE r <= 200"""

  override def queries: Map[String, QueryFn] = Map(
    "q251_mann_whitney" -> q251 _,
    "q252_ks_test"      -> q252 _,
    "q253_user_overlap" -> q253 _,
    "q254_zipf"         -> q254 _)

  override def oracles: Map[String, String] = Map(
    "q251_mann_whitney" -> q251Sql,
    "q252_ks_test"      -> q252Sql,
    "q253_user_overlap" -> q253Sql,
    "q254_zipf"         -> q254Sql)
}
