package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions

/** Round-3 window/aggregate surface, part 3: value-based (RANGE)
  * window frames, the built-in session_window generator, the
  * median/count_if/bool aggregate family, arrays_zip, and the
  * reduce() higher-order fold. All DuckDB-oracled.
  */
object Extras3 extends QueryPack {

  // ---------------------------------------------------------------- q86
  /** RANGE-framed window: per-customer trailing-30-day order count and
    * revenue at each order (value-based frame over the date axis, not
    * ROWS — peers with equal dates share a frame, so the result is
    * deterministic under ties). The 100 TB shape: one shuffle by
    * customer, sort by date in-partition, frame bounds resolved by
    * binary search in the sorted run. */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").cast("timestamp").cast("long"))
      .rangeBetween(-30L * 86400, 0)
    o.select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
             count(lit(1)).over(w).as("n_30d"),
             round(sum(col("o_totalprice")).over(w), 4).as("rev_30d"))
      .filter(pmod(col("o_custkey"), lit(50)) === 0)
      .orderBy(col("o_orderkey"))
  }

  private val q86Sql =
    """SELECT o_orderkey, o_custkey, o_orderdate,
         count(*) OVER w AS n_30d,
         round(sum(o_totalprice) OVER w, 4) AS rev_30d
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
         RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
       QUALIFY o_custkey % 50 = 0
       ORDER BY o_orderkey"""

  // ---------------------------------------------------------------- q87
  /** Built-in session_window generator (Spark's native gap-session
    * GROUP BY — merges events whose timestamp falls inside the open
    * session's [start, last+gap) window). Complements the custom
    * interval-sweep Sessionize (q33) and the streaming
    * flatMapGroupsWithState path: same semantics, zero custom code.
    * Oracle: gap-island window SQL with the >= gap boundary (an event
    * at exactly last+gap starts a NEW session). */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    e.groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
              col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("session_start"))
  }

  private val q87Sql =
    """WITH e AS (
         SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
       flagged AS (
         SELECT user_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800 * 1000000
                THEN 1 ELSE 0 END AS new_session
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       sessions AS (
         SELECT user_id, ts, value,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         FROM flagged)
       SELECT user_id, min(ts) AS session_start,
         count(*) AS n_events, round(sum(value), 4) AS sum_value
       FROM sessions GROUP BY user_id, sid
       ORDER BY user_id, session_start"""

  // ---------------------------------------------------------------- q88
  /** Ordered-set / conditional aggregate family: exact median,
    * count_if, bool_and/bool_or — per order-status over orders. */
  private def q88(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    o.groupBy(col("o_orderstatus"))
      .agg(round(median(col("o_totalprice")), 4).as("med_price"),
           count_if(col("o_totalprice") > 100000).as("n_big"),
           bool_and(col("o_totalprice") > 0).as("all_positive"),
           bool_or(col("o_orderpriority") === "1-URGENT").as("any_urgent"))
      .orderBy(col("o_orderstatus"))
  }

  private val q88Sql =
    """SELECT o_orderstatus,
         round(median(o_totalprice), 4) AS med_price,
         CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
         bool_and(o_totalprice > 0) AS all_positive,
         bool_or(o_orderpriority = '1-URGENT') AS any_urgent
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  // ---------------------------------------------------------------- q89
  /** arrays_zip + posexplode: positional pairing of two derived arrays
    * (token index ↔ token) without a join — the array-native shape for
    * "align two parallel sequences"; one generator, no shuffle. */
  private def q89(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val toks = TextFunctions.tokens(col("text"))
    d.filter(pmod(col("doc_id"), lit(25)) === 0)
      .select(col("doc_id"),
        explode(arrays_zip(
          sequence(lit(1), least(lit(3), size(toks))),
          slice(toks, 1, 3))).as("z"))
      .select(col("doc_id"), col("z.0").cast("int").as("pos"), col("z.1").as("tok"))
      .orderBy(col("doc_id"), col("pos"))
  }

  private val q89Sql =
    """WITH base AS (
         SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
         FROM documents WHERE doc_id % 25 = 0)
       SELECT doc_id, CAST(i AS INT) AS pos, toks[i] AS tok
       FROM base, unnest(generate_series(1, least(3, len(toks)))) AS t(i)
       ORDER BY doc_id, pos"""

  // ---------------------------------------------------------------- q90
  /** reduce() higher-order fold with a finish lambda: per-document
    * total token characters, doubled in the finisher, then aggregated
    * per language — the general "fold an array without exploding it"
    * primitive (no generator, no shuffle until the final small agg). */
  private def q90(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val toks = TextFunctions.tokens(col("text"))
    d.select(col("lang"),
        reduce(toks, lit(0L), (acc, t) => acc + length(t),
               acc => acc * 2).as("folded"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("folded")).as("sum_folded"))
      .orderBy(col("lang"))
  }

  private val q90Sql =
    """WITH t AS (
         SELECT lang,
           2 * list_sum(list_transform(
             regexp_split_to_array(trim(text), '\s+'), x -> len(x))) AS folded
         FROM documents)
       SELECT lang, count(*) AS n_docs,
         CAST(sum(folded) AS BIGINT) AS sum_folded
       FROM t GROUP BY lang ORDER BY lang"""

  override def queries: Map[String, QueryFn] = Map(
    "q86_range_window"   -> q86 _,
    "q87_session_window" -> q87 _,
    "q88_median_boolagg" -> q88 _,
    "q89_arrays_zip"     -> q89 _,
    "q90_reduce_fold"    -> q90 _)

  override def oracles: Map[String, String] = Map(
    "q86_range_window"   -> q86Sql,
    "q87_session_window" -> q87Sql,
    "q88_median_boolagg" -> q88Sql,
    "q89_arrays_zip"     -> q89Sql,
    "q90_reduce_fold"    -> q90Sql)
}
