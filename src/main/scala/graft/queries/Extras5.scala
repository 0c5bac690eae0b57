package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-3 surface, part 5: bitwise aggregates, percentile_cont
  * interpolation parity, and the Spark-4 SQL conveniences GROUP BY ALL
  * and IDENTIFIER(). All DuckDB-oracled.
  */
object Extras5 extends QueryPack {

  // --------------------------------------------------------------- q103
  /** Bitwise aggregate family — bit_and / bit_or / bit_xor over int
    * flags (the compact representation for permission masks and
    * feature flags at scale: fixed-width state, map-side combinable). */
  private def q103(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val flags = pmod(col("o_orderkey"), lit(256)).cast("int")
    o.select(col("o_orderstatus"), flags.as("f"))
      .groupBy(col("o_orderstatus"))
      .agg(bit_and(col("f")).as("and_f"),
           bit_or(col("f")).as("or_f"),
           bit_xor(col("f")).as("xor_f"),
           sum(bit_count(col("f"))).as("popcount"))
      .orderBy(col("o_orderstatus"))
  }

  private val q103Sql =
    """SELECT o_orderstatus,
         bit_and((o_orderkey % 256)::INT) AS and_f,
         bit_or((o_orderkey % 256)::INT) AS or_f,
         bit_xor((o_orderkey % 256)::INT) AS xor_f,
         CAST(sum(bit_count((o_orderkey % 256)::INT)) AS BIGINT) AS popcount
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  // --------------------------------------------------------------- q104
  /** percentile_cont interpolation parity: the CONTINUOUS percentile
    * (linear interpolation between order statistics) at quartiles —
    * Spark's percentile() and DuckDB's quantile_cont must agree on
    * exact interpolated doubles, not just on member values. */
  private def q104(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir)("lineitem")
    l.groupBy(col("l_returnflag"))
      .agg(round(element_at(percentile(col("l_extendedprice"),
             array(lit(0.25), lit(0.5), lit(0.75))), 1), 4).as("p25"),
           round(element_at(percentile(col("l_extendedprice"),
             array(lit(0.25), lit(0.5), lit(0.75))), 2), 4).as("p50"),
           round(element_at(percentile(col("l_extendedprice"),
             array(lit(0.25), lit(0.5), lit(0.75))), 3), 4).as("p75"))
      .orderBy(col("l_returnflag"))
  }

  private val q104Sql =
    """SELECT l_returnflag,
         round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
         round(quantile_cont(l_extendedprice, 0.50), 4) AS p50,
         round(quantile_cont(l_extendedprice, 0.75), 4) AS p75
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // --------------------------------------------------------------- q105
  /** GROUP BY ALL (Spark 4 / modern SQL): every non-aggregate select
    * item becomes a grouping key — the guard against silently wrong
    * hand-listed GROUP BY columns in wide rollups. DuckDB speaks the
    * same dialect, so the oracle IS the same text modulo table ref. */
  private def q105(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir)("lineitem").createOrReplaceTempView("q105_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
           count(*) AS n, round(sum(l_quantity), 2) AS qty
         FROM q105_lineitem
         GROUP BY ALL
         ORDER BY l_returnflag, l_linestatus""")
  }

  private val q105Sql =
    """SELECT l_returnflag, l_linestatus,
         count(*) AS n, round(sum(l_quantity), 2) AS qty
       FROM lineitem
       GROUP BY ALL
       ORDER BY l_returnflag, l_linestatus"""

  // --------------------------------------------------------------- q106
  /** IDENTIFIER() clause (Spark 4): dynamic-but-injection-safe table
    * and column references — the parameterized-DDL companion to q94's
    * parameterized literals. */
  private def q106(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir)("nation").createOrReplaceTempView("q106_nation")
    s.sql(
      """SELECT n_regionkey, count(*) AS n
         FROM IDENTIFIER(:tbl)
         GROUP BY IDENTIFIER(:keycol)
         ORDER BY n_regionkey""",
      Map("tbl" -> "q106_nation", "keycol" -> "n_regionkey"))
  }

  private val q106Sql =
    """SELECT n_regionkey, count(*) AS n
       FROM nation GROUP BY n_regionkey ORDER BY n_regionkey"""

  // --------------------------------------------------------------- q107
  /** Array set-algebra family — array_union / array_intersect /
    * array_except / array_position / array_contains / flatten over each
    * document's token halves. Sizes (not arrays) are compared because
    * Spark preserves first-occurrence order while DuckDB's list set ops
    * don't define one — the MEMBERSHIP semantics are what's pinned. */
  private def q107(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val toks = split(trim(col("text")), "\\s+")
    val half = (size(toks) / 2).cast("int")
    val a = slice(toks, lit(1), half)
    val b = slice(toks, half + 1, size(toks) - half)
    d.filter(pmod(col("doc_id"), lit(7)) === 0)
      .select(col("doc_id"),
        size(array_union(a, b)).as("n_union"),
        size(array_intersect(a, b)).as("n_inter"),
        size(array_except(a, b)).as("n_except"),
        array_position(toks, "the").as("pos_the"),
        array_contains(toks, "value").as("has_value"),
        size(flatten(array(a, b))).as("n_flat"))
      .orderBy(col("doc_id"))
  }

  private val q107Sql =
    """WITH t AS (
         SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
         FROM documents WHERE doc_id % 7 = 0),
       h AS (
         SELECT doc_id, toks,
           toks[1 : len(toks) // 2] AS a,
           toks[len(toks) // 2 + 1 :] AS b
         FROM t)
       SELECT doc_id,
         CAST(len(list_distinct(list_concat(a, b))) AS INT) AS n_union,
         CAST(len(list_distinct(list_intersect(a, b))) AS INT) AS n_inter,
         CAST(len(list_filter(list_distinct(a),
           x -> NOT list_contains(b, x))) AS INT) AS n_except,
         CAST(coalesce(list_position(toks, 'the'), 0) AS BIGINT) AS pos_the,
         list_contains(toks, 'value') AS has_value,
         CAST(len(flatten([a, b])) AS INT) AS n_flat
       FROM h ORDER BY doc_id"""

  // --------------------------------------------------------------- q108
  /** Nearest as-of — composed from the native operator's two
    * directions: latest prior click AND earliest later click per
    * purchase, keep whichever is closer in time (ties -> prior). Two
    * merge scans + one key-local join; no interval cross-product. The
    * oracle replays both DuckDB ASOF directions with the same rule. */
  private def q108(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    def purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"))
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"),
              col("ts").as("click_ts"), col("ts"))
    val back = graft.plans.AsOfJoinPlan.backward(purchases, clicks,
        Seq("user_id"), "ts", "ts", Seq("click_id", "click_ts"))
      .select(col("user_id"), col("event_id"), col("ts"),
              col("asof_click_id").as("b_id"), col("asof_click_ts").as("b_ts"))
    val fwd = graft.plans.AsOfJoinPlan.forward(purchases, clicks,
        Seq("user_id"), "ts", "ts", Seq("click_id", "click_ts"))
      .select(col("event_id").as("f_event_id"),
              col("asof_click_id").as("f_id"), col("asof_click_ts").as("f_ts"))
    val bGap = unix_micros(col("ts")) - unix_micros(col("b_ts"))
    val fGap = unix_micros(col("f_ts")) - unix_micros(col("ts"))
    back.join(fwd, col("event_id") === col("f_event_id"))
      .select(col("user_id"), col("event_id").as("purchase_id"),
        when(col("b_ts").isNotNull && (col("f_ts").isNull || bGap <= fGap),
             col("b_id")).otherwise(col("f_id")).as("nearest_click"),
        when(col("b_ts").isNotNull && (col("f_ts").isNull || bGap <= fGap),
             lit("prior")).otherwise(lit("later")).as("direction"))
      .orderBy(col("user_id"), col("purchase_id"))
  }

  private val q108Sql =
    """WITH p AS (
         SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts
         FROM events WHERE event_type = 'purchase'),
       c AS (
         SELECT user_id, event_id AS click_id, CAST(ts AS TIMESTAMP) AS ts
         FROM events WHERE event_type = 'click'),
       b AS (
         SELECT p.user_id, p.event_id, p.ts, c.click_id AS b_id, c.ts AS b_ts
         FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts),
       f AS (
         SELECT p.event_id, c.click_id AS f_id, c.ts AS f_ts
         FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts <= c.ts)
       SELECT b.user_id, b.event_id AS purchase_id,
         CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
                epoch_us(b.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(b.ts))
              THEN b_id ELSE f_id END AS nearest_click,
         CASE WHEN b_ts IS NOT NULL AND (f_ts IS NULL OR
                epoch_us(b.ts) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(b.ts))
              THEN 'prior' ELSE 'later' END AS direction
       FROM b JOIN f ON b.event_id = f.event_id
       ORDER BY b.user_id, purchase_id"""

  override def queries: Map[String, QueryFn] = Map(
    "q103_bit_aggs"        -> q103 _,
    "q104_percentile_cont" -> q104 _,
    "q105_group_by_all"    -> q105 _,
    "q106_identifier"      -> q106 _,
    "q107_array_funcs"     -> q107 _,
    "q108_asof_nearest"    -> q108 _)

  override def oracles: Map[String, String] = Map(
    "q103_bit_aggs"        -> q103Sql,
    "q104_percentile_cont" -> q104Sql,
    "q105_group_by_all"    -> q105Sql,
    "q106_identifier"      -> q106Sql,
    "q107_array_funcs"     -> q107Sql,
    "q108_asof_nearest"    -> q108Sql)
}
