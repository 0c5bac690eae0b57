package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 39: survival analysis, language-model
  * diagnostics, cluster quality, and seasonal decomposition — the
  * statistics a curation team runs before (and after) a training run.
  *
  * Numeric discipline follows the house rules: counts stay integer as
  * long as possible, money is exact cents, and ln/exp enter only where
  * both engines fold the identical sequence (window frames) or where a
  * 4-6-decimal round absorbs summation-order noise (precedents q189,
  * q244, q246).
  */
object Extras43 extends QueryPack {

  // --------------------------------------------------------------- q277
  /** Kaplan-Meier survival of "time to next order" per customer.
    * Repurchase gaps are events; each customer's tail (last order to
    * the dataset horizon) is a censored observation. The product-limit
    * estimator is a running product over the ORDERED event grid =
    * exp(running sum of ln(1 - d/n)) — a window whose frame order both
    * engines share, over factors that are exact integer ratios, so the
    * doubles agree bit-for-bit. The global window runs on the
    * aggregated day grid (bounded by max gap in days, ~hundreds of
    * rows), not raw orders — the RowIndexer pattern is the scale path
    * if the grid ever grew. Output sampled at 30-day ticks. */
  private def q277(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val gaps = o.select(col("o_custkey"), col("o_orderdate"),
      datediff(lead(col("o_orderdate"), 1).over(w), col("o_orderdate"))
        .as("dur"))
    val mx = o.agg(max("o_orderdate").as("mx"))
    val durs = gaps.crossJoin(broadcast(mx))
      .select(
        when(col("dur").isNull, datediff(col("mx"), col("o_orderdate")))
          .otherwise(col("dur")).as("t"),
        when(col("dur").isNull, lit(0)).otherwise(lit(1)).as("ev"))
    val grid = durs.groupBy("t")
      .agg(sum("ev").as("d"), count(lit(1)).as("c"))
    val total = durs.agg(count(lit(1)).as("n_total"))
    val wPrior = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum("c").over(wPrior), lit(0L)))
      .filter(col("d") < col("n_risk"))
      .withColumn("s",
        exp(sum(log(lit(1) - col("d").cast("double") / col("n_risk")))
          .over(wRun)))
      .filter(col("d") > 0 && col("t") % 30 === 0)
      .select(col("t").cast("long").as("t_days"),
        col("n_risk").cast("long").as("n_risk"),
        col("d").cast("long").as("n_events"),
        round(col("s"), 6).as("survival"))
      .orderBy("t_days")
  }

  private val q277Sql =
    """WITH maxd AS (SELECT max(o_orderdate) AS mx FROM orders),
       gaps AS (
         SELECT o_orderdate AS od,
                datediff('day', o_orderdate,
                  lead(o_orderdate) OVER (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey)) AS dur
         FROM orders),
       durs AS (
         SELECT CASE WHEN dur IS NULL THEN datediff('day', od, mx)
                     ELSE dur END AS t,
                CASE WHEN dur IS NULL THEN 0 ELSE 1 END AS ev
         FROM gaps CROSS JOIN maxd),
       agg AS (SELECT t, sum(ev) AS d, count(*) AS c FROM durs GROUP BY t),
       km AS (
         SELECT t, d,
                (SELECT count(*) FROM durs)
                  - coalesce(sum(c) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS n_risk
         FROM agg),
       curve AS (
         SELECT t, d, n_risk,
                exp(sum(ln(1 - CAST(d AS DOUBLE) / n_risk))
                  OVER (ORDER BY t)) AS s
         FROM km WHERE d < n_risk)
       SELECT CAST(t AS BIGINT) AS t_days, CAST(n_risk AS BIGINT) AS n_risk,
              CAST(d AS BIGINT) AS n_events, round(s, 6) AS survival
       FROM curve WHERE d > 0 AND t % 30 = 0 ORDER BY t_days"""

  // --------------------------------------------------------------- q278
  /** Per-source average token surprisal under the corpus's own unigram
    * model — the zero-dependency perplexity proxy that flags
    * out-of-distribution sources before a KenLM pass exists. Term
    * stats broadcast back to the token stream exactly like q58's
    * TF-IDF join; the tokenizer is shared verbatim with the oracle. */
  private def q278(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val toks = d.select(col("source"),
      explode(filter(split(lower(col("text")), "[^a-z]+"),
        w => length(w) > 0)).as("w"))
    val vocab = toks.groupBy("w").agg(count(lit(1)).as("cnt"))
    val tot = vocab.agg(sum("cnt").as("n"))
    toks.join(broadcast(vocab), "w")
      .crossJoin(broadcast(tot))
      .groupBy("source")
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(-log(col("cnt").cast("double") / col("n"))), 5)
          .as("avg_surprisal"))
      .orderBy("source")
  }

  private val q278Sql =
    """WITH toks AS (
         SELECT source, t.w
         FROM documents,
              unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(w)
         WHERE t.w <> ''),
       vocab AS (SELECT w, count(*) AS cnt FROM toks GROUP BY w),
       tot AS (SELECT sum(cnt) AS n FROM vocab)
       SELECT source, CAST(count(*) AS BIGINT) AS n_tokens,
              round(avg(-ln(CAST(v.cnt AS DOUBLE) / tot.n)), 5)
                AS avg_surprisal
       FROM toks JOIN vocab v USING (w) CROSS JOIN tot
       GROUP BY source ORDER BY source"""

  // --------------------------------------------------------------- q279
  /** Simplified silhouette per label: a = distance to the own-label
    * centroid, b = distance to the nearest other centroid, s =
    * (b-a)/max(a,b) — the centroid form (vs all-pairs) is the one that
    * scales, O(n·k) instead of O(n²). Same relational (id, dim, val)
    * grain as q196/q213; centroids broadcast back to the flat grain. */
  private def q279(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("embeddings")
    val flat = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("v", col("v").cast("double"))
    val cent = flat.groupBy(col("label").as("clabel"), col("dim"))
      .agg(avg("v").as("c"))
    val d2 = flat.join(broadcast(cent), Seq("dim"))
      .groupBy(col("vec_id"), col("label"), col("clabel"))
      .agg(sum((col("v") - col("c")) * (col("v") - col("c"))).as("d2"))
    val ab = d2.groupBy("vec_id", "label")
      .agg(sqrt(max(when(col("label") === col("clabel"), col("d2"))))
          .as("a"),
        sqrt(min(when(col("label") =!= col("clabel"), col("d2"))))
          .as("b"))
    ab.groupBy("label")
      .agg(count(lit(1)).as("n"),
        round(avg((col("b") - col("a")) / greatest(col("a"), col("b"))), 5)
          .as("avg_silhouette"))
      .orderBy("label")
  }

  private val q279Sql =
    """WITH flat AS (
         SELECT vec_id, label, t.dim, embedding[t.dim + 1]::DOUBLE AS v
         FROM embeddings, unnest(range(len(embedding))) AS t(dim)),
       cent AS (SELECT label, dim, avg(v) AS c FROM flat GROUP BY 1, 2),
       d2 AS (
         SELECT f.vec_id, f.label AS own, c.label AS other,
                sum((f.v - c.c) * (f.v - c.c)) AS d2
         FROM flat f JOIN cent c ON f.dim = c.dim
         GROUP BY 1, 2, 3),
       ab AS (
         SELECT vec_id, own,
                sqrt(max(CASE WHEN own = other THEN d2 END)) AS a,
                sqrt(min(CASE WHEN own <> other THEN d2 END)) AS b
         FROM d2 GROUP BY 1, 2)
       SELECT own AS label, CAST(count(*) AS BIGINT) AS n,
              round(avg((b - a) / greatest(a, b)), 5) AS avg_silhouette
       FROM ab GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q280
  /** Classical seasonal index: monthly revenue over its centered
    * 12-month moving average, averaged per calendar month across
    * years. Monthly sums are exact cents; the moving average folds the
    * same 12 integers in the same frame order in both engines, so the
    * ratios are identical doubles. The global window runs over the
    * ~84-row month grid. */
  private def q280(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val m = o.groupBy(date_trunc("month", col("o_orderdate")).as("mo"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).as("c"))
    val w = Window.orderBy("mo").rowsBetween(-6, 5)
    m.select(col("mo"), col("c"),
        avg(col("c")).over(w).as("trend"),
        count(lit(1)).over(w).as("nw"))
      .filter(col("nw") === 12)
      .groupBy(month(col("mo")).as("month"))
      .agg(count(lit(1)).as("n_years"),
        round(avg(col("c") / col("trend")), 5).as("seasonal_index"))
      .orderBy("month")
  }

  private val q280Sql =
    """WITH m AS (
         SELECT date_trunc('month', o_orderdate) AS mo,
                sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
         FROM orders GROUP BY 1),
       ma AS (
         SELECT mo, c,
                avg(CAST(c AS DOUBLE)) OVER (ORDER BY mo
                  ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS trend,
                count(*) OVER (ORDER BY mo
                  ROWS BETWEEN 6 PRECEDING AND 5 FOLLOWING) AS nw
         FROM m)
       SELECT CAST(month(mo) AS INT) AS month,
              CAST(count(*) AS BIGINT) AS n_years,
              round(avg(c / trend), 5) AS seasonal_index
       FROM ma WHERE nw = 12 GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q281
  /** Theil-Sen robust trend of monthly revenue: the median of all
    * pairwise slopes. The month grid is tiny (~84 rows), so the
    * all-pairs inequality join is a DESIGNED nested-loop over an
    * aggregate — ~3.5k pairs — not a data-scale cartesian (the q243
    * pattern; excluded from the PlanShapeSpec sweep on purpose).
    * Slopes are exact-cents deltas over integer month gaps; the median
    * interpolates the same two central doubles in both engines. */
  private def q281(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val m = o.groupBy((year(col("o_orderdate")) * 12
        + month(col("o_orderdate"))).as("mi"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).as("c"))
    val a = m.select(col("mi").as("mi1"), col("c").as("c1"))
    val b = m.select(col("mi").as("mi2"), col("c").as("c2"))
    a.join(b, col("mi2") > col("mi1"))
      .select(((col("c2") - col("c1"))
        / (col("mi2") - col("mi1")).cast("double")).as("slope"))
      .agg(count(lit(1)).as("n_pairs"),
        round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY slope)")
          / 100, 4).as("ts_slope"),
        round(min("slope") / 100, 4).as("min_slope"),
        round(max("slope") / 100, 4).as("max_slope"))
  }

  private val q281Sql =
    """WITH m AS (
         SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS mi,
                sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
         FROM orders GROUP BY 1),
       pairs AS (
         SELECT (b.c - a.c) / CAST((b.mi - a.mi) AS DOUBLE) AS slope
         FROM m a JOIN m b ON b.mi > a.mi)
       SELECT CAST(count(*) AS BIGINT) AS n_pairs,
              round(median(slope) / 100, 4) AS ts_slope,
              round(min(slope) / 100, 4) AS min_slope,
              round(max(slope) / 100, 4) AS max_slope
       FROM pairs"""

  // --------------------------------------------------------------- q282
  /** Association rules over order baskets at brand grain:
    * support / confidence / lift for every co-occurring brand pair
    * with ≥20 joint orders, top-25 by lift. All three metrics are
    * ratios of integer counts (identical doubles); the basket
    * self-join is equi-keyed on the order key (the q140 shape), never
    * a cartesian. */
  private def q282(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val items = t("lineitem")
      .join(broadcast(t("part")), col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
      .distinct()
    val tot = items.agg(countDistinct("ok").as("n"))
    val cnt = items.groupBy("b").agg(count(lit(1)).as("c"))
    val pair = items.as("x").join(items.as("y"),
        col("x.ok") === col("y.ok") && col("x.b") =!= col("y.b"))
      .groupBy(col("x.b").as("ante"), col("y.b").as("cons"))
      .agg(count(lit(1)).as("nb"))
      .filter(col("nb") >= 20)
    pair
      .join(broadcast(cnt.select(col("b").as("ante"), col("c").as("ca"))),
        Seq("ante"))
      .join(broadcast(cnt.select(col("b").as("cons"), col("c").as("cc"))),
        Seq("cons"))
      .crossJoin(broadcast(tot))
      .select(col("ante"), col("cons"), col("nb").cast("long").as("n_both"),
        round(col("nb").cast("double") / col("n"), 5).as("support"),
        round(col("nb").cast("double") / col("ca"), 5).as("confidence"),
        ((col("nb").cast("double") / col("ca"))
          / (col("cc").cast("double") / col("n"))).as("lift_raw"))
      .orderBy(col("lift_raw").desc, col("ante"), col("cons"))
      .limit(25)
      .select(col("ante"), col("cons"), col("n_both"), col("support"),
        col("confidence"), round(col("lift_raw"), 5).as("lift"))
  }

  private val q282Sql =
    """WITH items AS (
         SELECT DISTINCT l.l_orderkey AS ok, p.p_brand AS b
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
       tot AS (SELECT count(DISTINCT ok) AS n FROM items),
       cnt AS (SELECT b, count(*) AS c FROM items GROUP BY b),
       pair AS (
         SELECT a.b AS ante, c.b AS cons, count(*) AS nb
         FROM items a JOIN items c ON a.ok = c.ok AND a.b <> c.b
         GROUP BY 1, 2),
       rules AS (
         SELECT ante, cons, nb,
                CAST(nb AS DOUBLE) / tot.n AS support,
                CAST(nb AS DOUBLE) / ca.c AS confidence,
                (CAST(nb AS DOUBLE) / ca.c)
                  / (CAST(cc.c AS DOUBLE) / tot.n) AS lift
         FROM pair JOIN cnt ca ON pair.ante = ca.b
                   JOIN cnt cc ON pair.cons = cc.b
                   CROSS JOIN tot
         WHERE nb >= 20)
       SELECT ante, cons, CAST(nb AS BIGINT) AS n_both,
              round(support, 5) AS support,
              round(confidence, 5) AS confidence, round(lift, 5) AS lift
       FROM rules ORDER BY lift DESC, ante, cons LIMIT 25"""

  override def queries: Map[String, QueryFn] = Map(
    "q277_km_survival"   -> q277 _,
    "q278_surprisal"     -> q278 _,
    "q279_silhouette"    -> q279 _,
    "q280_seasonality"   -> q280 _,
    "q281_theil_sen"     -> q281 _,
    "q282_assoc_rules"   -> q282 _)

  override def oracles: Map[String, String] = Map(
    "q277_km_survival"   -> q277Sql,
    "q278_surprisal"     -> q278Sql,
    "q279_silhouette"    -> q279Sql,
    "q280_seasonality"   -> q280Sql,
    "q281_theil_sen"     -> q281Sql,
    "q282_assoc_rules"   -> q282Sql)
}
