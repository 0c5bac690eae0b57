package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RangeJoin

/** Post-parity extensions flagged in SURVEY.md (§2.6 approx aggregates,
  * §7.2 slice 5): HLL approximate distinct and a bucketed range join. */
object Extras extends QueryPack {

  // ---------------------------------------------------------------- q39
  /** approx_count_distinct (HLL++) against the exact count. Spark's and
    * DuckDB's sketches differ, so the oracle-stable output is the exact
    * count plus an each-engine-checks-its-own-sketch tolerance flag —
    * the honest way to hash-compare approximate aggregates. */
  private def q39(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"),
           approx_count_distinct(col("l_partkey")).as("approx"))
      .select(col("l_returnflag"), col("exact_parts"),
              (abs(col("approx") - col("exact_parts")) <=
                col("exact_parts") * 0.05).as("approx_within_5pct"))
      .orderBy(col("l_returnflag"))

  private val q39Sql =
    """SELECT l_returnflag,
       count(DISTINCT l_partkey) AS exact_parts,
       (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
         <= count(DISTINCT l_partkey) * 0.05) AS approx_within_5pct
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------------------------------------------------------------- q40
  /** Range join via time bucketing: events within one hour after each
    * signup by the same user (interval [signup, signup+1h)), counted
    * per signup. DuckDB's oracle is the plain non-equi join — same
    * semantics, different (non-scalable) plan. */
  private def q40(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir)("events")
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("user_id"), col("event_id").as("signup_id"),
              col("ts").as("s_ts"),
              (col("ts") + expr("INTERVAL 1 HOUR")).as("s_end"))
    val points = ev.select(col("user_id").as("p_user"), col("ts").as("p_ts"))
    val matched = RangeJoin.pointInInterval(
        points, "p_user", "p_ts", signups, "user_id", "s_ts", "s_end",
        bucketWidthSec = 3600)
      .groupBy(col("signup_id"))
      .agg(count(lit(1)).as("n"))
    signups.join(matched, Seq("signup_id"), "left")
      .select(col("user_id"), col("signup_id"),
              coalesce(col("n"), lit(0L)).as("n_follow"))
      .orderBy(col("user_id"), col("signup_id"))
  }

  private val q40Sql =
    """WITH s AS (
         SELECT user_id, event_id AS signup_id, CAST(ts AS TIMESTAMP) AS ts
         FROM events WHERE event_type = 'signup'),
       e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
       SELECT s.user_id, signup_id, count(e.ts) AS n_follow
       FROM s LEFT JOIN e
         ON s.user_id = e.user_id AND e.ts >= s.ts
        AND e.ts < s.ts + INTERVAL 1 HOUR
       GROUP BY s.user_id, signup_id
       ORDER BY s.user_id, signup_id"""

  override val queries: Map[String, QueryFn] = Map(
    "q39_approx_distinct" -> q39 _,
    "q40_range_join"      -> q40 _)

  override val oracles: Map[String, String] = Map(
    "q39_approx_distinct" -> q39Sql,
    "q40_range_join"      -> q40Sql)
}
