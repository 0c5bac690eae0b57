package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-8 pack, part 10: ingestion change-point detection (q422) and
  * UniMax-style token-budget water-filling (q423).
  */
object Extras67 extends QueryPack {

  // --------------------------------------------------------------- q422
  /** Offline CHANGE-POINT detection per event type — binary
    * segmentation's first split: the day boundary that maximizes the
    * SSE reduction of the daily-count series (the "when did the
    * crawler/feed change behavior" telemetry question; a large
    * reduction with distant segment means flags a regime shift worth
    * gating ingestion on). Everything derives from prefix sums of
    * INTEGER counts — cs/cq running sums are exact in doubles (counts
    * ≪ 2⁵³), so SSE_left + SSE_right per candidate split is
    * bit-identical across engines without any fold ordering care, and
    * the argmax is total-ordered (reduction desc, then earliest day).
    * 100 TB shape: one (type, day) hash-agg over the corpus, then the
    * per-type scan of its ~365-row series under one window — the
    * candidate evaluation never rejoins the corpus. */
  private def q422(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables(s, dir)("events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("double").as("c"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val pre = daily
      .withColumn("rn", row_number().over(w))
      .withColumn("cs", sum("c").over(w))
      .withColumn("cq", sum(col("c") * col("c")).over(w))
    val tot = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("c").as("s"),
        sum(col("c") * col("c")).as("q"))
    val cand = pre.join(tot, Seq("event_type"))
      .filter(col("rn") < col("n"))
      .withColumn("sse0", col("q") - col("s") * col("s") / col("n"))
      .withColumn("red",
        col("sse0") -
          (col("cq") - col("cs") * col("cs") / col("rn")) -
          ((col("q") - col("cq")) -
            (col("s") - col("cs")) * (col("s") - col("cs")) /
              (col("n") - col("rn"))))
    val best = Window.partitionBy("event_type")
      .orderBy(col("red").desc, col("day"))
    cand.withColumn("pick", row_number().over(best))
      .filter(col("pick") === 1)
      .select(col("event_type"), col("day").as("split_day"),
        col("n").cast("long").as("n_days"),
        round(col("cs") / col("rn"), 6).as("mean_left"),
        round((col("s") - col("cs")) / (col("n") - col("rn")), 6)
          .as("mean_right"),
        round(col("red"), 6).as("reduction"),
        round(when(col("sse0") === 0, 0.0)
          .otherwise(col("red") / col("sse0")), 6).as("reduction_frac"))
      .orderBy("event_type")
  }

  private val q422Sql =
    """WITH daily AS MATERIALIZED (
         SELECT event_type, CAST(ts AS DATE) AS day,
                CAST(count(*) AS DOUBLE) AS c
         FROM events GROUP BY 1, 2),
       pre AS (
         SELECT event_type, day, c,
           row_number() OVER w AS rn,
           sum(c) OVER w AS cs,
           sum(c * c) OVER w AS cq
         FROM daily
         WINDOW w AS (PARTITION BY event_type ORDER BY day
                      ROWS UNBOUNDED PRECEDING)),
       tot AS (
         SELECT event_type, count(*) AS n, sum(c) AS s, sum(c * c) AS q
         FROM daily GROUP BY 1),
       cand AS (
         SELECT pre.event_type, pre.day, pre.rn, pre.cs, tot.n, tot.s,
                tot.q - tot.s * tot.s / tot.n AS sse0,
                (tot.q - tot.s * tot.s / tot.n)
                  - (pre.cq - pre.cs * pre.cs / pre.rn)
                  - ((tot.q - pre.cq)
                     - (tot.s - pre.cs) * (tot.s - pre.cs)
                       / (tot.n - pre.rn)) AS red
         FROM pre JOIN tot USING (event_type)
         WHERE pre.rn < tot.n),
       best AS (
         SELECT *, row_number() OVER (PARTITION BY event_type
                     ORDER BY red DESC, day) AS pick
         FROM cand)
       SELECT event_type, day AS split_day,
              CAST(n AS BIGINT) AS n_days,
              round(cs / rn, 6) AS mean_left,
              round((s - cs) / (n - rn), 6) AS mean_right,
              round(red, 6) AS reduction,
              round(CASE WHEN sse0 = 0 THEN 0.0 ELSE red / sse0 END, 6)
                AS reduction_frac
       FROM best WHERE pick = 1
       ORDER BY event_type"""

  // --------------------------------------------------------------- q423
  /** UniMax token-budget WATER-FILLING (Chung et al. 2023, "UniMax:
    * Fairer and More Effective Language Sampling"): allocate a global
    * budget B (here 60% of total chars) across sources so small
    * sources keep everything and big sources share the remainder
    * evenly — the principled alternative to temperature mixing
    * (q156/q292) that never over-samples a small source. Closed-form
    * relational solve: sources sorted ascending, a source is FULL when
    * its size fits the per-remaining-source share given every smaller
    * source kept everything (prefix-AND via a running min, robust even
    * where the fit test is not monotone); the big ones split the
    * leftover as floor + first-r-get-one-extra (ascending order). All
    * INTEGER arithmetic — allocations are exact and sum to exactly B.
    * 100 TB shape: one source-keyed agg, then an S-row window solve. */
  private def q423(s: SparkSession, dir: String): DataFrame = {
    val src = Tables(s, dir)("documents")
      .groupBy("source").agg(sum(col("n_chars")).cast("long").as("n"))
    val tot = src.agg(sum("n").as("t"), count(lit(1)).as("ns"))
      .select(expr("(t * 6) div 10").as("b"), col("ns"))
    val w = Window.orderBy(col("n"), col("source"))
    val ord = src
      .withColumn("rn", row_number().over(w))
      .withColumn("cum", sum("n").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("fits",
        when(col("n") * (col("ns") - col("rn") + 1) <=
          col("b") - (col("cum") - col("n")), 1L).otherwise(0L))
      .withColumn("full", min("fits").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val prefix = ord.agg(
      sum(when(col("full") === 1, col("n")).otherwise(0L)).as("cum_full"),
      sum(col("full")).as("p"))
    val out = ord.crossJoin(broadcast(prefix))
      .withColumn("nbig", col("ns") - col("p"))
      .withColumn("rem", col("b") - col("cum_full"))
      .withColumn("alloc",
        when(col("full") === 1, col("n"))
          .otherwise(expr("rem div nbig") +
            when(col("rn") - col("p") <= col("rem") % col("nbig"), 1L)
              .otherwise(0L)))
    out.select(col("source"), col("n").as("n_chars"),
        col("b").cast("long").as("budget"),
        col("alloc").cast("long").as("alloc"),
        when(col("alloc") < col("n"), 1L).otherwise(0L).as("capped"))
      .orderBy("source")
  }

  private val q423Sql =
    """WITH src AS MATERIALIZED (
         SELECT source, CAST(sum(n_chars) AS BIGINT) AS n
         FROM documents GROUP BY 1),
       tot AS (SELECT (sum(n) * 6) // 10 AS b, count(*) AS ns FROM src),
       ord AS MATERIALIZED (
         SELECT source, n,
           row_number() OVER w AS rn,
           sum(n) OVER w AS cum,
           b, ns
         FROM src CROSS JOIN tot
         WINDOW w AS (ORDER BY n, source ROWS UNBOUNDED PRECEDING)),
       flagged AS MATERIALIZED (
         SELECT *,
           CASE WHEN n * (ns - rn + 1) <= b - (cum - n)
                THEN 1 ELSE 0 END AS fits
         FROM ord),
       runmin AS MATERIALIZED (
         SELECT *, min(fits) OVER (ORDER BY rn
                      ROWS UNBOUNDED PRECEDING) AS is_full
         FROM flagged),
       prefix AS (
         SELECT sum(CASE WHEN is_full = 1 THEN n ELSE 0 END) AS cum_full,
                sum(is_full) AS p
         FROM runmin)
       SELECT source, n AS n_chars, CAST(b AS BIGINT) AS budget,
              CAST(CASE WHEN is_full = 1 THEN n
                   ELSE (b - cum_full) // (ns - p) +
                        (CASE WHEN rn - p <= (b - cum_full) % (ns - p)
                              THEN 1 ELSE 0 END)
                   END AS BIGINT) AS alloc,
              CAST(CASE WHEN is_full = 0 AND
                        (b - cum_full) // (ns - p) +
                        (CASE WHEN rn - p <= (b - cum_full) % (ns - p)
                              THEN 1 ELSE 0 END) < n
                   THEN 1 ELSE 0 END AS BIGINT) AS capped
       FROM runmin CROSS JOIN prefix
       ORDER BY source"""

  override def queries: Map[String, QueryFn] = Map(
    "q422_change_point" -> q422 _,
    "q423_unimax_budget" -> q423 _)

  override def oracles: Map[String, String] = Map(
    "q422_change_point" -> q422Sql,
    "q423_unimax_budget" -> q423Sql)
}
