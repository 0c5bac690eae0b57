package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{AsOfJoin, Sessionize}
import graft.streaming.EventsStream

/** Event-stream coverage: tumbling windows, gap sessionization, as-of
  * join, and the Structured-Streaming twin of the window aggregate.
  *
  * The testdata stores `ts` as parquet TIMESTAMP_MICROS: DuckDB scans it
  * as a native TIMESTAMP while the engine normalizes to the UTC-session
  * TimestampType (Tables.normalizeTs) — same micros on both sides. The
  * oracles' `CAST(ts AS TIMESTAMP)` is a no-op kept for robustness
  * against the encoding shifting again (it also parses under the old
  * raw-nanos layout).
  */
object Events extends QueryPack {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("events")

  // ---------------------------------------------------------------- q32
  /** Tumbling 1-hour window aggregate per event type (batch). */
  private def q32(s: SparkSession, dir: String): DataFrame =
    ev(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
              col("n_events"), round(col("sum_value"), 4).as("sum_value"))
      .orderBy(col("window_start"), col("event_type"))

  private val q32Sql =
    """SELECT CAST(time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
       event_type, count(*) AS n_events, round(sum(value), 4) AS sum_value
       FROM events GROUP BY 1, 2 ORDER BY window_start, event_type"""

  // ---------------------------------------------------------------- q33
  /** Gap sessionization (30-min) + per-session rollup: the
    * lag/running-sum window pair, then one aggregate. */
  private def q33(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionize(ev(s, dir), "user_id", "ts", "event_id", gapSeconds = 1800)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("sum_value"),
           round((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
                   .cast("double") / 1e6, 6).as("duration_s"))
      .orderBy(col("user_id"), col("session_id"))

  // --------------------------------------------------------------- q394
  /** q33's sessionization through the NATIVE SessionId window function
    * (one Window operator instead of the lag + running-sum pair; see
    * graft.functions.expressions.SessionId). Shares q33's oracle
    * verbatim: the driver hash-compare IS the bit-equality proof. */
  private def q394(s: SparkSession, dir: String): DataFrame =
    Sessionize.sessionizeNative(ev(s, dir), "user_id", "ts", "event_id",
        gapSeconds = 1800)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           round(sum(col("value")), 4).as("sum_value"),
           round((unix_micros(max(col("ts"))) - unix_micros(min(col("ts"))))
                   .cast("double") / 1e6, 6).as("duration_s"))
      .orderBy(col("user_id"), col("session_id"))

  private val q33Sql =
    """WITH e AS (
         SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events),
       flagged AS (
         SELECT user_id, event_id, ts, value,
           CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
                THEN 1 ELSE 0 END AS new_session
         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sessions AS (
         SELECT user_id, event_id, ts, value,
           sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
         FROM flagged)
       SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         count(*) AS n_events, round(sum(value), 4) AS sum_value,
         round((epoch_us(max(ts)) - epoch_us(min(ts))) * 1.0 / 1e6, 6) AS duration_s
       FROM sessions GROUP BY user_id, session_id
       ORDER BY user_id, session_id"""

  // ---------------------------------------------------------------- q34
  /** As-of join: each purchase matched to the latest prior-or-equal
    * click by the same user (union + fill-forward window — one shuffle,
    * no range cross product). DuckDB's native ASOF JOIN is the oracle. */
  private def q34(s: SparkSession, dir: String): DataFrame = {
    val e = ev(s, dir)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("click_ts"), col("ts"))
    AsOfJoin.backward(purchases, clicks, Seq("user_id"),
        leftTime = "ts", rightTime = "ts", rightCols = Seq("click_id", "click_ts"))
      .select(col("user_id"), col("event_id").as("purchase_id"),
              col("asof_click_id").as("click_id"),
              round((unix_micros(col("ts")) - unix_micros(col("asof_click_ts")))
                      .cast("double") / 1e6, 6).as("gap_s"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  private val q34Sql =
    """WITH p AS (
         SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
         FROM events WHERE event_type = 'purchase'),
       c AS (
         SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS ts
         FROM events WHERE event_type = 'click')
       SELECT p.user_id, p.event_id AS purchase_id, c.click_id,
         round((epoch_us(p.ts) - epoch_us(c.ts)) * 1.0 / 1e6, 6) AS gap_s
       FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
       ORDER BY p.user_id, purchase_id"""

  // ---------------------------------------------------------------- q35
  /** Structured-Streaming twin of q32: readStream → tumbling window →
    * memory sink, drained to completion. Shares q32's oracle — stream
    * and batch must agree exactly. */
  private def q35(s: SparkSession, dir: String): DataFrame =
    EventsStream.windowedAggToMemory(s, dir, queryName = "q35_stream_out")
      .orderBy(col("window_start"), col("event_type"))

  override val queries: Map[String, QueryFn] = Map(
    "q32_event_window" -> q32 _,
    "q33_sessionize"   -> q33 _,
    "q394_native_sessionize" -> q394 _,
    "q34_asof_join"    -> q34 _,
    "q35_stream_window"-> q35 _)

  override val oracles: Map[String, String] = Map(
    "q32_event_window" -> q32Sql,
    "q33_sessionize"   -> q33Sql,
    "q394_native_sessionize" -> q33Sql,
    "q34_asof_join"    -> q34Sql,
    "q35_stream_window"-> q32Sql)
}
