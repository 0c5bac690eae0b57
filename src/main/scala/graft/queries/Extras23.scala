package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 19: composite corpus dashboard, sliding
  * distinct-user windows, and higher-order event n-grams.
  */
object Extras23 extends QueryPack {

  // --------------------------------------------------------------- q200
  /** Per-source corpus dashboard: document counts, size stats, language
    * mix, and duplicate-line ratio in ONE result — the composite
    * monitoring query a curation pipeline reports after every run.
    * Two corpus passes total (doc-grain stats + the line-dedup join),
    * both keyed on source for the final merge. */
  private def q200(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val base = d.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
           round(avg("n_chars"), 2).as("avg_chars"),
           round(avg(when(col("lang") === "en", 1).otherwise(0)), 6)
             .as("pct_en"))
    val lines = d.select(col("source"),
        explode(split(col("text"), "\n")).as("raw"))
      .select(col("source"), trim(col("raw")).as("line"))
      .filter(col("line") =!= "")
    val occ = lines.groupBy("line").agg(count(lit(1)).as("occ"))
    val dup = lines.join(occ, "line")
      .groupBy("source")
      .agg(round(sum(when(col("occ") > 1, 1).otherwise(0)) /
        count(lit(1)).cast("double"), 6).as("dup_line_ratio"))
    base.join(dup, "source").orderBy("source")
  }

  private val q200Sql =
    """WITH base AS (
         SELECT source, count(*) AS n_docs,
                round(avg(n_chars), 2) AS avg_chars,
                round(avg(CASE WHEN lang = 'en' THEN 1 ELSE 0 END), 6)
                  AS pct_en
         FROM documents GROUP BY 1),
       lines AS (
         SELECT source, trim(l) AS line
         FROM documents, unnest(string_split(text, chr(10))) AS u(l)
         WHERE trim(l) <> ''),
       occ AS (SELECT line, count(*) AS occ FROM lines GROUP BY 1),
       dup AS (
         SELECT source,
                round(sum(CASE WHEN occ > 1 THEN 1 ELSE 0 END)
                      / count(*)::DOUBLE, 6) AS dup_line_ratio
         FROM lines JOIN occ USING (line) GROUP BY 1)
       SELECT source, n_docs, avg_chars, pct_en, dup_line_ratio
       FROM base JOIN dup USING (source) ORDER BY source"""

  // --------------------------------------------------------------- q201
  /** Rolling 7-day distinct active users per day: each (user, day)
    * activity row fans out to the ≤7 window days it contributes to
    * (bounded explode), then one distinct-count per day — the sliding
    * DAU/WAU metric without an expanding window re-scan. */
  private def q201(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val act = e.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val days = act.select(col("d")).distinct()
    val fan = act.select(col("user_id"),
        explode(expr("sequence(d, date_add(d, 6))")).as("wd"))
    days.join(fan, col("d") === col("wd"))
      .groupBy("d")
      .agg(count_distinct(col("user_id")).as("wau7"))
      .orderBy("d")
  }

  private val q201Sql =
    """WITH act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       days AS (SELECT DISTINCT d FROM act),
       fan AS (
         SELECT user_id, CAST(u.x AS DATE) AS wd
         FROM act, unnest(generate_series(d, d + 6, INTERVAL 1 DAY)) AS u(x))
       SELECT days.d, count(DISTINCT fan.user_id) AS wau7
       FROM days JOIN fan ON days.d = fan.wd
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q202
  /** Event-type trigrams per user stream (two stacked lead() windows
    * over ONE user-keyed sort), top 15 — the order-3 extension of
    * q136's bigrams for sequence-model feature mining. */
  private def q202(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e.select(col("event_type").as("a"),
        lead(col("event_type"), 1).over(w).as("b"),
        lead(col("event_type"), 2).over(w).as("c"))
      .filter(col("b").isNotNull && col("c").isNotNull)
      .groupBy("a", "b", "c").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), col("a"), col("b"), col("c"))
      .limit(15)
  }

  private val q202Sql =
    """WITH t AS (
         SELECT event_type AS a,
                lead(event_type, 1) OVER w AS b,
                lead(event_type, 2) OVER w AS c
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT a, b, c, count(*) AS n
       FROM t WHERE b IS NOT NULL AND c IS NOT NULL
       GROUP BY 1, 2, 3
       ORDER BY n DESC, a, b, c LIMIT 15"""

  override def queries: Map[String, QueryFn] = Map(
    "q200_source_dashboard" -> q200 _,
    "q201_rolling_wau"      -> q201 _,
    "q202_trigrams"         -> q202 _)

  override def oracles: Map[String, String] = Map(
    "q200_source_dashboard" -> q200Sql,
    "q201_rolling_wau"      -> q201Sql,
    "q202_trigrams"         -> q202Sql)
}
