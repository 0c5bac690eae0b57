package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 6: classic warehouse/sequence analytics —
  * gaps-and-islands streaks, SCD2-style run compression, sweep-line
  * peak concurrency, market-basket co-occurrence, RFM segmentation,
  * and entropy aggregates.
  */
object Extras10 extends QueryPack {

  // --------------------------------------------------------------- q137
  /** Gaps-and-islands: longest consecutive-day activity streak per
    * user, reported as a streak-length histogram. The islands trick is
    * pure window arithmetic (day − row_number is constant within an
    * island), so the whole query is one user-keyed shuffle — no
    * self-join, which is what makes it survive a 100× scale-up. */
  private def q137(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val days = e.select(col("user_id"), to_date(col("ts")).as("d")).distinct()
    val w = Window.partitionBy("user_id").orderBy("d")
    val islands = days
      .withColumn("grp", date_sub(col("d"), row_number().over(w)))
      .groupBy("user_id", "grp").agg(count(lit(1)).as("len"))
      .groupBy("user_id").agg(max("len").as("best"))
    islands.groupBy(col("best").as("streak_days"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("streak_days")
  }

  private val q137Sql =
    """WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
       isl AS (
         SELECT user_id,
                d - CAST(row_number() OVER (PARTITION BY user_id ORDER BY d)
                         AS INT) AS grp
         FROM days),
       runs AS (SELECT user_id, grp, count(*) AS len FROM isl GROUP BY 1, 2),
       best AS (SELECT user_id, max(len) AS best FROM runs GROUP BY 1)
       SELECT best AS streak_days, count(*) AS n_users
       FROM best GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q138
  /** SCD Type-2 run compression: per user, collapse consecutive
    * same-type events into versioned rows with [valid_from, valid_to)
    * ranges (valid_to NULL for the current run). lag() marks run
    * starts, a running sum numbers the runs, lead() closes each range —
    * three window passes over ONE user-keyed sort, no self-join. */
  private def q138(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val chg = e.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("is_new",
        when(lag(col("event_type"), 1).over(w).isNull ||
             lag(col("event_type"), 1).over(w) =!= col("event_type"), 1)
          .otherwise(0))
      .withColumn("run_id", sum(col("is_new")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val runs = chg.groupBy("user_id", "run_id")
      .agg(min(col("event_type")).as("event_type"),
           min(col("ts")).as("valid_from"),
           count(lit(1)).as("n_events"))
    val w2 = Window.partitionBy("user_id").orderBy("run_id")
    runs.withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
      .filter(col("user_id") < 50)
      .select(col("user_id"), col("run_id"), col("event_type"),
        col("valid_from"), col("valid_to"), col("n_events"))
      .orderBy("user_id", "run_id")
  }

  private val q138Sql =
    """WITH chg AS (
         SELECT user_id, ts, event_id, event_type,
                CASE WHEN lag(event_type) OVER w IS NULL
                       OR lag(event_type) OVER w <> event_type
                     THEN 1 ELSE 0 END AS is_new
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       numbered AS (
         SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS run_id
         FROM chg),
       runs AS (
         SELECT user_id, run_id, min(event_type) AS event_type,
                min(ts) AS valid_from, count(*) AS n_events
         FROM numbered GROUP BY 1, 2)
       SELECT user_id, CAST(run_id AS BIGINT) AS run_id, event_type,
              valid_from,
              lead(valid_from) OVER (PARTITION BY user_id ORDER BY run_id)
                AS valid_to,
              n_events
       FROM runs WHERE user_id < 50
       ORDER BY user_id, run_id"""

  // --------------------------------------------------------------- q139
  /** Sweep-line peak concurrency: sessionize events (30-min gap), turn
    * each session into a +1/−1 delta pair, and take the max running sum
    * — ends sort before starts at the same instant (delta asc), so a
    * back-to-back handoff doesn't double-count. The running sum is one
    * global ordered window: fine here because the delta stream is
    * already two-rows-per-SESSION (not per event); at 100 TB you'd
    * pre-aggregate deltas per timestamp first, which this does too. */
  private def q139(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gapMs = 30 * 60 * 1000L
    val sess = e
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_s",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > gapMs * 1000, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "sid")
      .agg(min("ts").as("s_start"), max("ts").as("s_end"))
    val deltas = sess.select(col("s_start").as("t"), lit(1).as("delta"))
      .unionAll(sess.select(col("s_end").as("t"), lit(-1).as("delta")))
      .groupBy("t").agg(sum("delta").as("delta"))
    val ws = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.withColumn("live", sum(col("delta")).over(ws))
      .agg(max(col("live")).as("peak_concurrent"))
  }

  private val q139Sql =
    """WITH marked AS (
         SELECT user_id, ts, event_id,
                CASE WHEN lag(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                     THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       sess AS (
         SELECT user_id,
                sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid,
                ts
         FROM marked),
       iv AS (
         SELECT user_id, sid, min(ts) AS s_start, max(ts) AS s_end
         FROM sess GROUP BY 1, 2),
       deltas AS (
         SELECT t, sum(delta) AS delta FROM (
           SELECT s_start AS t, 1 AS delta FROM iv
           UNION ALL
           SELECT s_end AS t, -1 AS delta FROM iv) u
         GROUP BY 1)
       SELECT CAST(max(live) AS BIGINT) AS peak_concurrent FROM (
         SELECT sum(delta) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS live
         FROM deltas) s"""

  // --------------------------------------------------------------- q140
  /** Market-basket co-occurrence: part pairs bought in the same order,
    * top 20 by support. The self-join grain is bounded by items/order
    * (≤7 in TPC-H), so the pair blow-up is a small constant factor of
    * the fact table, and the join key is the order key both sides —
    * one co-partitioned shuffle. */
  private def q140(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir)("lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val a = li.select(col("ok"), col("pk").as("p1"))
    val b = li.select(col("ok"), col("pk").as("p2"))
    a.join(b, "ok").filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("n_orders"))
      .orderBy(desc("n_orders"), col("p1"), col("p2"))
      .limit(20)
  }

  private val q140Sql =
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem)
       SELECT a.pk AS p1, b.pk AS p2, count(*) AS n_orders
       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
       GROUP BY 1, 2
       ORDER BY n_orders DESC, p1, p2 LIMIT 20"""

  // --------------------------------------------------------------- q141
  /** RFM segmentation: recency / frequency / monetary per customer,
    * quartiled with ntile and rolled up to segment counts. ntile is
    * order-dependent under ties, so every ORDER BY carries the customer
    * key as the deterministic tie-break — the oracle spells the same
    * rule. One customer-grain aggregate, three global ntile windows
    * over the REDUCED (one-row-per-customer) set. */
  private def q141(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val rfm = o.groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("last_order"),
           count(lit(1)).as("freq"),
           round(sum(col("o_totalprice")), 2).as("monetary"))
    val seg = rfm
      .withColumn("r", ntile(4).over(
        Window.orderBy(desc("last_order"), col("custkey"))))
      .withColumn("f", ntile(4).over(
        Window.orderBy(desc("freq"), col("custkey"))))
      .withColumn("m", ntile(4).over(
        Window.orderBy(desc("monetary"), col("custkey"))))
    seg.groupBy("r", "f", "m").agg(count(lit(1)).as("n_customers"))
      .orderBy("r", "f", "m")
  }

  private val q141Sql =
    """WITH rfm AS (
         SELECT o_custkey AS custkey, max(o_orderdate) AS last_order,
                count(*) AS freq, round(sum(o_totalprice), 2) AS monetary
         FROM orders GROUP BY 1),
       seg AS (
         SELECT ntile(4) OVER (ORDER BY last_order DESC, custkey) AS r,
                ntile(4) OVER (ORDER BY freq DESC, custkey) AS f,
                ntile(4) OVER (ORDER BY monetary DESC, custkey) AS m
         FROM rfm)
       SELECT r, f, m, count(*) AS n_customers
       FROM seg GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""

  // --------------------------------------------------------------- q142
  /** Shannon entropy of the event-type mix per day-of-week: how varied
    * is user behavior by weekday. Two hash aggregates (type-counts,
    * then the entropy fold) — entropy is computed from counts, never
    * from raw rows, so the second agg input is #days × #types rows. */
  private def q142(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val cnt = e.groupBy(dayofweek(col("ts")).as("dow"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy("dow")
    cnt.withColumn("p", col("n") / sum(col("n")).over(tot))
      .groupBy("dow")
      .agg(round((-sum(col("p") * log2(col("p")))), 6).as("entropy_bits"),
           sum(col("n")).as("n_events"))
      .orderBy("dow")
  }

  private val q142Sql =
    """WITH cnt AS (
         SELECT dayofweek(ts) + 1 AS dow, event_type, count(*) AS n
         FROM events GROUP BY 1, 2),
       p AS (
         SELECT dow, n,
                n::DOUBLE / sum(n) OVER (PARTITION BY dow) AS p
         FROM cnt)
       SELECT dow, round(-sum(p * log2(p)), 6) AS entropy_bits,
              CAST(sum(n) AS BIGINT) AS n_events
       FROM p GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q137_streaks"     -> q137 _,
    "q138_scd2_runs"   -> q138 _,
    "q139_concurrency" -> q139 _,
    "q140_basket"      -> q140 _,
    "q141_rfm"         -> q141 _,
    "q142_entropy"     -> q142 _)

  override def oracles: Map[String, String] = Map(
    "q137_streaks"     -> q137Sql,
    "q138_scd2_runs"   -> q138Sql,
    "q139_concurrency" -> q139Sql,
    "q140_basket"      -> q140Sql,
    "q141_rfm"         -> q141Sql,
    "q142_entropy"     -> q142Sql)
}
