package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.RangeJoin

/** Post-parity extensions flagged in SURVEY.md (§2.6 approx aggregates,
  * §7.2 slice 5): HLL approximate distinct and a bucketed range join. */
object Extras extends QueryPack {

  // ---------------------------------------------------------------- q73
  /** VariantType (Spark 4's semi-structured column type): parse once
    * into the binary variant encoding, then typed variant_get paths —
    * unlike q42's from_json there is NO fixed schema; the shredded
    * variant carries whatever fields each row has, the 100 TB answer
    * to schema-drifting event properties. Oracle via DuckDB's JSON
    * extraction (same values, different encoding). */
  private def q73(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("events")
      .select(col("event_type"), parse_json(col("props")).as("v"))
      .select(col("event_type"),
              expr("variant_get(v, '$.k', 'int')").as("k"),
              expr("variant_get(v, '$.tag', 'string')").as("tag"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
           sum(col("k")).as("sum_k"),
           count(col("tag")).as("n_with_tag"),
           min(col("tag")).as("min_tag"))
      .orderBy(col("event_type"))

  private val q73Sql =
    """SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       count(tag) AS n_with_tag,
       min(tag) AS min_tag
       FROM (SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS INT) AS k,
               json_extract_string(props, '$.tag') AS tag
             FROM events)
       GROUP BY event_type ORDER BY event_type"""

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

  // ---------------------------------------------------------------- q41
  /** Custom aggregate surface, BOTH generations in one oracled query:
    * the typed Aggregator via udaf (encoder-bound ScalaAggregator) and
    * the native WeightedAverage DeclarativeAggregate (two DoubleType
    * buffer slots, update/merge as Catalyst expressions — stays inside
    * whole-stage codegen like the built-in avg). Same algebra, one
    * oracle: sum(p*q)/sum(q), emitted under both column names. */
  private def q41(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.WeightedAverage.weightedAvgNative
    val wavg = udaf(graft.functions.WeightedAvg)
    Tables(s, dir)("lineitem")
      .groupBy(col("l_returnflag"))
      .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 6)
             .as("wavg_price"),
           round(weightedAvgNative(col("l_extendedprice"), col("l_quantity")), 6)
             .as("wavg_native"),
           count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))
  }

  private val q41Sql =
    """SELECT l_returnflag,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS wavg_price,
       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS wavg_native,
       count(*) AS n
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------------------------------------------------------------- q42
  /** JSON column surface: schema'd from_json over the events `props`
    * string, extracted field aggregated per event type. */
  private def q42(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("events")
      .select(col("event_type"),
              from_json(col("props"),
                org.apache.spark.sql.types.StructType.fromDDL("k INT"))
                .getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_with_k"),
           sum(col("k")).as("sum_k"),
           round(avg(col("k")), 6).as("avg_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  private val q42Sql =
    """SELECT event_type,
       count(k) AS n_with_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       round(avg(k), 6) AS avg_k,
       CAST(max(k) AS INT) AS max_k
       FROM (SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS INT) AS k
             FROM events)
       GROUP BY event_type ORDER BY event_type"""

  // ---------------------------------------------------------------- q46
  /** CUBE with GROUPING() indicators — all 2^2 aggregation levels of
    * (segment, nation) in one pass (rollup's sibling; q20 covers the
    * hierarchical form). Null group keys disambiguated from real nulls
    * by the grouping flags, labeled 'ALL' for engine-neutral ordering. */
  private def q46(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir)("customer"); val n = Tables(s, dir)("nation")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .cube(col("c_mktsegment"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           round(avg(col("c_acctbal")), 4).as("avg_acctbal"),
           grouping(col("c_mktsegment")).cast("int").as("g_segment"),
           grouping(col("n_name")).cast("int").as("g_nation"))
      .select(coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
              coalesce(col("n_name"), lit("ALL")).as("nation"),
              col("n_customers"), col("avg_acctbal"),
              col("g_segment"), col("g_nation"))
      .orderBy(col("g_segment"), col("g_nation"), col("segment"), col("nation"))
  }

  private val q46Sql =
    """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
              coalesce(n_name, 'ALL') AS nation,
              count(*) AS n_customers,
              round(avg(c_acctbal), 4) AS avg_acctbal,
              CAST(GROUPING(c_mktsegment) AS INT) AS g_segment,
              CAST(GROUPING(n_name) AS INT) AS g_nation
       FROM customer JOIN nation ON c_nationkey = n_nationkey
       GROUP BY CUBE (c_mktsegment, n_name)
       ORDER BY g_segment, g_nation, segment, nation"""

  override val queries: Map[String, QueryFn] = Map(
    "q39_approx_distinct" -> q39 _,
    "q40_range_join"      -> q40 _,
    "q41_typed_aggregator"-> q41 _,
    "q42_json_extract"    -> q42 _,
    "q46_cube_grouping"   -> q46 _,
    "q73_variant"         -> q73 _)

  override val oracles: Map[String, String] = Map(
    "q39_approx_distinct" -> q39Sql,
    "q40_range_join"      -> q40Sql,
    "q41_typed_aggregator"-> q41Sql,
    "q42_json_extract"    -> q42Sql,
    "q46_cube_grouping"   -> q46Sql,
    "q73_variant"         -> q73Sql)
}
