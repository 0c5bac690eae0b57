package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 1: linear-regression aggregates, mode/listagg,
  * IGNORE NULLS window gap-filling, and a count-min-sketch frequency
  * probe. All DuckDB-oracled.
  */
object Extras6 extends QueryPack {

  // --------------------------------------------------------------- q109
  /** Linear-regression aggregate family — regr_slope / regr_intercept /
    * regr_r2 / regr_count plus corr and covar_samp, fitting
    * extendedprice against quantity per return flag. One pass,
    * map-side-combinable moment sketches (sum, sum², sum·xy): the same
    * fixed-width state that scales these to 100 TB groups. */
  private def q109(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir)("lineitem")
    val (y, x) = (col("l_extendedprice"), col("l_quantity"))
    l.groupBy(col("l_returnflag"))
      .agg(round(regr_slope(y, x), 4).as("slope"),
           round(regr_intercept(y, x), 4).as("icept"),
           round(regr_r2(y, x), 6).as("r2"),
           regr_count(y, x).as("n"),
           round(corr(y, x), 6).as("xy_corr"),
           round(covar_samp(y, x), 2).as("cov"))
      .orderBy(col("l_returnflag"))
  }

  private val q109Sql =
    """SELECT l_returnflag,
         round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
         round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
         round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
         CAST(regr_count(l_extendedprice, l_quantity) AS BIGINT) AS n,
         round(corr(l_extendedprice, l_quantity), 6) AS xy_corr,
         round(covar_samp(l_extendedprice, l_quantity), 2) AS cov
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // --------------------------------------------------------------- q110
  /** mode() + listagg WITHIN GROUP (SQL:2023 surface, Spark 4).
    * Deterministic mode (lowest value wins ties) and an ordered
    * distinct listagg — the oracle spells the same tie-break by hand
    * (max count, then min value), so the check holds even if counts
    * tie at another scale factor. */
  private def q110(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir)("orders").createOrReplaceTempView("q110_orders")
    s.sql(
      """SELECT o_orderpriority,
           mode(o_orderstatus, true) AS status_mode,
           listagg(DISTINCT o_orderstatus, ',')
             WITHIN GROUP (ORDER BY o_orderstatus) AS statuses
         FROM q110_orders
         GROUP BY o_orderpriority
         ORDER BY o_orderpriority""")
  }

  private val q110Sql =
    """WITH c AS (
         SELECT o_orderpriority, o_orderstatus, count(*) AS n
         FROM orders GROUP BY 1, 2),
       m AS (
         SELECT o_orderpriority, min(o_orderstatus) AS status_mode
         FROM (SELECT c.*, max(n) OVER (PARTITION BY o_orderpriority) AS mx
               FROM c)
         WHERE n = mx GROUP BY o_orderpriority),
       l AS (
         SELECT o_orderpriority,
                string_agg(DISTINCT o_orderstatus, ','
                  ORDER BY o_orderstatus) AS statuses
         FROM orders GROUP BY 1)
       SELECT m.o_orderpriority, m.status_mode, l.statuses
       FROM m JOIN l USING (o_orderpriority)
       ORDER BY o_orderpriority"""

  // --------------------------------------------------------------- q111
  /** IGNORE NULLS window gap-filling — the sensor/fill-forward pattern:
    * per user in event-time order, carry the most recent prior purchase
    * amount (lag IGNORE NULLS) and the next upcoming one (lead IGNORE
    * NULLS) onto every event. One shuffle+sort per partition key; no
    * self-join, no explode — the shape that survives wide tables. */
  private def q111(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val purchase = when(col("event_type") === "purchase", col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.select(col("event_id"), col("user_id"), col("ts"), col("event_type"),
             purchase.as("p"))
      .withColumn("prev_purchase", round(lag(col("p"), 1, null, ignoreNulls = true).over(w), 2))
      .withColumn("next_purchase", round(lead(col("p"), 1, null, ignoreNulls = true).over(w), 2))
      .select(col("event_id"), col("user_id"),
              col("prev_purchase"), col("next_purchase"))
      .orderBy(col("event_id"))
  }

  private val q111Sql =
    """SELECT event_id, user_id,
         round(lag(CASE WHEN event_type = 'purchase' THEN value END,
                   1 IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
           AS prev_purchase,
         round(lead(CASE WHEN event_type = 'purchase' THEN value END,
                    1 IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id), 2)
           AS next_purchase
       FROM events ORDER BY event_id"""

  // --------------------------------------------------------------- q116
  /** Count-min-sketch frequency estimation — build the sketch as a
    * distributed mergeable aggregate (fixed depth×width state,
    * map-side combined like any moment sketch), then probe it for the
    * per-type event counts. Width 8192 / depth 5 makes collisions
    * across 5 distinct keys vanishingly unlikely, so the estimates are
    * exact and the count(*) oracle hash-matches; at 100 TB the sketch
    * stays the same few hundred KB while exact GROUP BY state grows
    * with cardinality. */
  private def q116(s: SparkSession, dir: String): DataFrame = {
    import java.nio.charset.StandardCharsets.UTF_8
    val e = Tables(s, dir)("events")
    val bin = e.agg(
      count_min_sketch(col("event_type"), lit(0.00025), lit(0.99), lit(42))
        .as("sk")).head.getAs[Array[Byte]](0)
    val sketch = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(bin))
    val types = Seq("click", "error", "purchase", "signup", "view")
    import s.implicits._
    types.map(t => (t, sketch.estimateCount(t.getBytes(UTF_8))))
      .toDF("event_type", "n").orderBy(col("event_type"))
  }

  private val q116Sql =
    """SELECT event_type, count(*) AS n
       FROM events GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------------------------- q117
  /** Stream-static join (see EventsStream.streamStaticEnrichToMemory):
    * clicks enriched with the broadcast per-user purchase profile; the
    * drained finite stream equals the batch join, which is the oracle. */
  private def q117(s: SparkSession, dir: String): DataFrame =
    graft.streaming.EventsStream
      .streamStaticEnrichToMemory(s, dir, queryName = "q117_enrich_out")
      .orderBy(col("event_id"))

  private val q117Sql =
    """WITH s AS (
         SELECT user_id, CAST(count(*) AS BIGINT) AS n_purchases,
                round(sum(round(value * 100)) / 100, 2) AS total_purchase
         FROM events WHERE event_type = 'purchase' GROUP BY user_id)
       SELECT e.event_id, e.user_id, s.n_purchases, s.total_purchase
       FROM events e JOIN s USING (user_id)
       WHERE e.event_type = 'click'
       ORDER BY e.event_id"""

  // --------------------------------------------------------------- q121
  /** Typed KeyValueGroupedDataset.cogroup — per-key access to BOTH
    * sides' rows as iterators, the typed escape hatch when per-group
    * logic won't express relationally (custom merges, sequence
    * alignment). Semantics are full-outer grouped: keys present on
    * either side emit. The oracle spells the same result as a full
    * outer join of per-key aggregates; prices snap to integer cents so
    * the per-group imperative sum matches the SQL sum exactly. */
  private def q121(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = Tables(s, dir)
    val cust = t("customer")
      .select(col("c_custkey").as[Long], col("c_name").as[String])
    val ords = t("orders")
      .select(col("o_custkey").as[Long],
              round(col("o_totalprice") * 100).cast("long").as[Long])
    cust.groupByKey(_._1).cogroup(ords.groupByKey(_._1)) {
      (k, cs, os) =>
        val orderCents = os.map(_._2).toSeq
        Iterator((k, cs.size, orderCents.size.toLong, orderCents.sum))
    }.toDF("custkey", "n_cust_rows", "n_orders", "total_cents")
      .select(col("custkey"), col("n_cust_rows").cast("int").as("n_cust_rows"),
              col("n_orders"), col("total_cents"))
      .orderBy(col("custkey"))
  }

  private val q121Sql =
    """WITH o AS (
         SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
                CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                  AS total_cents
         FROM orders GROUP BY o_custkey)
       SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
              CASE WHEN c.c_custkey IS NULL THEN 0 ELSE 1 END AS n_cust_rows,
              COALESCE(o.n_orders, 0) AS n_orders,
              COALESCE(o.total_cents, 0) AS total_cents
       FROM customer c FULL OUTER JOIN o ON c.c_custkey = o.o_custkey
       ORDER BY custkey"""

  // --------------------------------------------------------------- q122
  /** Distribution-rank window family — ntile quartiles, cume_dist,
    * percent_rank, first_value and nth_value over a unique-key order.
    * One shuffle+sort per partition key serves all five functions (a
    * single Window node); the ratios are exact small-integer fractions
    * so no rounding tolerance is needed. */
  private def q122(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_orderpriority"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(cume_dist().over(w), 6).as("cd"),
        round(percent_rank().over(w), 6).as("pr"),
        first_value(col("o_orderkey")).over(w).as("top_key"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_key"))
      .orderBy(col("o_orderpriority"), col("pr"), col("o_orderkey"))
  }

  private val q122Sql =
    """SELECT o_orderpriority, o_orderkey,
         CAST(ntile(4) OVER w AS INT) AS quartile,
         round(cume_dist() OVER w, 6) AS cd,
         round(percent_rank() OVER w, 6) AS pr,
         first_value(o_orderkey) OVER w AS top_key,
         nth_value(o_orderkey, 2) OVER w AS second_key
       FROM orders
       WINDOW w AS (PARTITION BY o_orderpriority
                    ORDER BY o_totalprice DESC, o_orderkey)
       ORDER BY o_orderpriority, pr, o_orderkey"""

  // --------------------------------------------------------------- q123
  /** Timezone conversion — UTC event times shifted to IANA zones
    * (from_utc_timestamp) and bucketed by local hour: the
    * activity-by-local-time rollup every global product computes. The
    * three zones fan out through one explode(map(...)) so the input
    * scans once; both engines resolve DST through the same IANA tzdata. */
  private def q123(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    e.select(explode(map(
        lit("asia_tokyo"), hour(from_utc_timestamp(col("ts"), "Asia/Tokyo")),
        lit("america_ny"), hour(from_utc_timestamp(col("ts"), "America/New_York")),
        lit("utc"), hour(col("ts")))).as(Seq("zone", "h")))
      .groupBy(col("zone"), col("h"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("zone"), col("h"))
  }

  private val q123Sql =
    """WITH b AS (SELECT CAST(ts AS TIMESTAMP) AS t FROM events),
       u AS (
         SELECT 'asia_tokyo' AS zone,
                EXTRACT(hour FROM (t AT TIME ZONE 'UTC'
                                     AT TIME ZONE 'Asia/Tokyo')) AS h
         FROM b
         UNION ALL
         SELECT 'america_ny',
                EXTRACT(hour FROM (t AT TIME ZONE 'UTC'
                                     AT TIME ZONE 'America/New_York'))
         FROM b
         UNION ALL
         SELECT 'utc', EXTRACT(hour FROM t) FROM b)
       SELECT zone, CAST(h AS INT) AS h, count(*) AS n
       FROM u GROUP BY zone, h ORDER BY zone, h"""

  override def queries: Map[String, QueryFn] = Map(
    "q109_regr_family" -> q109,
    "q110_mode_listagg" -> q110,
    "q111_gap_fill" -> q111,
    "q116_cms_probe" -> q116,
    "q117_stream_static_join" -> q117,
    "q121_typed_cogroup" -> q121,
    "q122_rank_distribution" -> q122,
    "q123_timezones" -> q123)

  override def oracles: Map[String, String] = Map(
    "q109_regr_family" -> q109Sql,
    "q110_mode_listagg" -> q110Sql,
    "q111_gap_fill" -> q111Sql,
    "q116_cms_probe" -> q116Sql,
    "q117_stream_static_join" -> q117Sql,
    "q121_typed_cogroup" -> q121Sql,
    "q122_rank_distribution" -> q122Sql,
    "q123_timezones" -> q123Sql)
}
