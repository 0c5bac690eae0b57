package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.{EventsStream, TransformWithStateOps}

/** Event-stream coverage, part 2 (round 2): stream-stream interval
  * join and watermark-TTL streaming dedup — the two remaining
  * Structured-Streaming operator families after round 1's windowed agg
  * (q35) and custom state (StatefulSessionsSpec). Both drain a finite
  * file stream, so batch SQL is an exact oracle.
  */
object Events2 extends QueryPack {

  // ---------------------------------------------------------------- q61
  /** Stream-stream inner join: each purchase matched to every same-user
    * click in the 30 minutes before it, both sides watermarked (bounded
    * join state). Oracle is the equivalent batch interval join. */
  private def q61(s: SparkSession, dir: String): DataFrame =
    EventsStream.streamStreamJoinToMemory(s, dir, queryName = "q61_ssjoin_out")
      .orderBy(col("user_id"), col("purchase_id"), col("click_id"))

  private val q61Sql =
    """WITH p AS (
         SELECT user_id, event_id AS purchase_id, CAST(ts AS TIMESTAMP) AS p_ts
         FROM events WHERE event_type = 'purchase'),
       c AS (
         SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS c_ts
         FROM events WHERE event_type = 'click')
       SELECT p.user_id, p.purchase_id, c.click_id,
         round((epoch_us(p_ts) - epoch_us(c_ts)) * 1.0 / 1e6, 6) AS gap_s
       FROM p JOIN c ON p.user_id = c.user_id
         AND c_ts >= p_ts - INTERVAL 30 MINUTE AND c_ts <= p_ts
       ORDER BY p.user_id, p.purchase_id, c.click_id"""

  // ---------------------------------------------------------------- q62
  /** Streaming dedup with state TTL (dropDuplicatesWithinWatermark) on
    * (user_id, event_type); the drained sink aggregated per type equals
    * batch count(DISTINCT user_id). */
  private def q62(s: SparkSession, dir: String): DataFrame =
    EventsStream.streamDedupToMemory(s, dir, queryName = "q62_dedup_out")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_unique_users"))
      .orderBy(col("event_type"))

  private val q62Sql =
    """SELECT event_type, count(DISTINCT user_id) AS n_unique_users
       FROM events GROUP BY event_type ORDER BY event_type"""

  // ---------------------------------------------------------------- q84
  /** Spark 4 transformWithState (RocksDB state store, typed ValueState +
    * MapState): per-user running profile; the drained final emission
    * equals the batch per-user aggregate — the oracle. */
  private def q84(s: SparkSession, dir: String): DataFrame =
    TransformWithStateOps.runningUserProfileToMemory(s, dir,
      queryName = "q84_tws_out")

  private val q84Sql =
    """SELECT user_id, count(*) AS n_events,
       round(sum(value), 4) AS sum_value,
       CAST(count(DISTINCT event_type) AS INT) AS n_types
       FROM events GROUP BY user_id ORDER BY user_id"""

  // ---------------------------------------------------------------- q91
  /** q34's as-of join through the NATIVE custom physical operator
    * (AsOfJoinPlan: logical node → strategy → merge-scan exec) instead
    * of the union + fill-forward window — same DuckDB ASOF oracle. */
  private def q91(s: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables(s, dir)("events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("click_ts"), col("ts"))
    graft.plans.AsOfJoinPlan.backward(purchases, clicks, Seq("user_id"),
        leftTime = "ts", rightTime = "ts", rightCols = Seq("click_id", "click_ts"))
      .select(col("user_id"), col("event_id").as("purchase_id"),
              col("asof_click_id").as("click_id"),
              round((unix_micros(col("ts")) - unix_micros(col("asof_click_ts")))
                      .cast("double") / 1e6, 6).as("gap_s"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  private val q91Sql =
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

  // --------------------------------------------------------------- q100
  /** Forward as-of through the native operator: each purchase matched
    * to the EARLIEST same-user click at-or-after it (follow-on click
    * attribution). DuckDB ASOF with the inequality flipped is the
    * oracle. */
  private def q100(s: SparkSession, dir: String): DataFrame = {
    val e = graft.Tables(s, dir)("events")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("click_ts"), col("ts"))
    graft.plans.AsOfJoinPlan.forward(purchases, clicks, Seq("user_id"),
        leftTime = "ts", rightTime = "ts", rightCols = Seq("click_id", "click_ts"))
      .select(col("user_id"), col("event_id").as("purchase_id"),
              col("asof_click_id").as("click_id"),
              round((unix_micros(col("asof_click_ts")) - unix_micros(col("ts")))
                      .cast("double") / 1e6, 6).as("gap_s"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  private val q100Sql =
    """WITH p AS (
         SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
         FROM events WHERE event_type = 'purchase'),
       c AS (
         SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS ts
         FROM events WHERE event_type = 'click')
       SELECT p.user_id, p.event_id AS purchase_id, c.click_id,
         round((epoch_us(c.ts) - epoch_us(p.ts)) * 1.0 / 1e6, 6) AS gap_s
       FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts
       ORDER BY p.user_id, purchase_id"""

  override val queries: Map[String, QueryFn] = Map(
    "q61_stream_stream_join" -> q61 _,
    "q62_stream_dedup"       -> q62 _,
    "q84_tws_profile"        -> q84 _,
    "q91_asof_native"        -> q91 _,
    "q100_asof_forward"      -> q100 _)

  override val oracles: Map[String, String] = Map(
    "q61_stream_stream_join" -> q61Sql,
    "q62_stream_dedup"       -> q62Sql,
    "q84_tws_profile"        -> q84Sql,
    "q91_asof_native"        -> q91Sql,
    "q100_asof_forward"      -> q100Sql)
}
