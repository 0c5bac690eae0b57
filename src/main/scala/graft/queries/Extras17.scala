package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 13: latest-per-key dedup, new-vs-returning
  * user split, hourly percentile load bands, cumulative distinct users.
  */
object Extras17 extends QueryPack {

  // --------------------------------------------------------------- q171
  /** Latest-per-key via row_number()=1 — the CDC snapshot shape.
    * Distinct from q07's min-per-key AGGREGATE form on purpose: this is
    * the window formulation, which Spark executes with a map-side
    * Partial WindowGroupLimit (only each task's local winner crosses
    * the shuffle — q13's plan property, pinned in SqlSurfaceSpec). */
  private def q171(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("user_id") < 100)
      .select(col("user_id"), col("event_id").as("last_event_id"),
        col("ts").as("last_ts"), round(col("value"), 4).as("last_value"))
      .orderBy("user_id")
  }

  private val q171Sql =
    """WITH ranked AS (
         SELECT user_id, event_id, ts, value,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY ts DESC, event_id DESC) AS rn
         FROM events)
       SELECT user_id, event_id AS last_event_id, ts AS last_ts,
              round(value, 4) AS last_value
       FROM ranked WHERE rn = 1 AND user_id < 100 ORDER BY user_id"""

  // --------------------------------------------------------------- q174
  /** New vs returning daily actives: each (user, day) classifies
    * against the user's first-seen date. The first-seen reduce is one
    * row per user and joins back on the SAME user key the distinct
    * already shuffled on — no second wide shuffle. */
  private def q174(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val firstSeen = e.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("fd"))
    val activity = e.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
    activity.join(firstSeen, "user_id")
      .groupBy("d")
      .agg(sum(when(col("d") === col("fd"), 1).otherwise(0)).as("new_users"),
           sum(when(col("d") > col("fd"), 1).otherwise(0))
             .as("returning_users"))
      .orderBy("d")
  }

  private val q174Sql =
    """WITH first_seen AS (
         SELECT user_id, min(CAST(ts AS DATE)) AS fd FROM events GROUP BY 1),
       activity AS (
         SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events)
       SELECT a.d,
              CAST(sum(CASE WHEN a.d = f.fd THEN 1 ELSE 0 END) AS BIGINT)
                AS new_users,
              CAST(sum(CASE WHEN a.d > f.fd THEN 1 ELSE 0 END) AS BIGINT)
                AS returning_users
       FROM activity a JOIN first_seen f ON a.user_id = f.user_id
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q175
  /** Hourly load bands: p50/p95 of per-user event counts by hour of
    * day — the capacity-planning profile. The percentile input is the
    * (hour, user) reduce, never raw events. */
  private def q175(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val hu = e.groupBy(hour(col("ts")).as("h"), col("user_id"))
      .agg(count(lit(1)).as("n"))
    hu.groupBy("h")
      .agg(
        round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY n)"), 4)
          .as("p50"),
        round(expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY n)"), 4)
          .as("p95"),
        count(lit(1)).as("n_users"))
      .orderBy("h")
  }

  private val q175Sql =
    """WITH hu AS (
         SELECT extract(hour FROM ts) AS h, user_id, count(*) AS n
         FROM events GROUP BY 1, 2)
       SELECT CAST(h AS INT) AS h,
              round(percentile_cont(0.5) WITHIN GROUP (ORDER BY n), 4) AS p50,
              round(percentile_cont(0.95) WITHIN GROUP (ORDER BY n), 4) AS p95,
              count(*) AS n_users
       FROM hu GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q177
  /** Cumulative distinct users by day WITHOUT a running COUNT(DISTINCT)
    * window (which would re-scan history per day): first-seen per user
    * → daily new-user counts → running sum over the tiny day series.
    * The classic rewrite that turns an O(days × users) expanding
    * distinct into two shuffles of shrinking data. */
  private def q177(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val dailyNew = e.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("d"))
      .groupBy("d").agg(count(lit(1)).as("new_users"))
    val w = Window.orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dailyNew
      .withColumn("cumulative_users", sum("new_users").over(w))
      .orderBy("d")
  }

  private val q177Sql =
    """WITH first_seen AS (
         SELECT user_id, min(CAST(ts AS DATE)) AS fd FROM events GROUP BY 1),
       daily_new AS (
         SELECT fd AS d, count(*) AS new_users FROM first_seen GROUP BY 1)
       SELECT d, new_users,
              CAST(sum(new_users) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS cumulative_users
       FROM daily_new ORDER BY d"""

  override def queries: Map[String, QueryFn] = Map(
    "q171_latest_per_key"   -> q171 _,
    "q174_new_vs_returning" -> q174 _,
    "q175_hourly_bands"     -> q175 _,
    "q177_cumulative_users" -> q177 _)

  override def oracles: Map[String, String] = Map(
    "q171_latest_per_key"   -> q171Sql,
    "q174_new_vs_returning" -> q174Sql,
    "q175_hourly_bands"     -> q175Sql,
    "q177_cumulative_users" -> q177Sql)
}
