package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-3 scalar/generator/aggregate surface extensions: map-typed
  * columns (construction + higher-order map lambdas), URL parsing,
  * the stack()/inline() generator pair, and exact distinct counting
  * via fixed-width bitmaps. All DuckDB-oracled — map and URL results
  * are flattened to plain rows so the oracle can pin exact values
  * without needing DuckDB map/url builtins.
  */
object Extras2 extends QueryPack {

  // ---------------------------------------------------------------- q80
  /** Map-typed column family: str_to_map construction, then the full
    * higher-order surface — map_filter (drop a key), transform_values
    * (uppercase), transform_keys (prefix), map_concat (add a computed
    * entry) — flattened to (key, value) rows with explode(map). All is
    * codegen-friendly expression work; at scale this is a pure
    * map-side pass. */
  private def q80(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir)("part")
    val m = str_to_map(
      concat(lit("size:"), col("p_size").cast("string"),
             lit(",brand:"), col("p_brand"),
             lit(",type:"), col("p_type")),
      lit(","), lit(":"))
    val shaped = map_concat(
      transform_keys(
        transform_values(
          map_filter(m, (k, _) => k =!= "type"),
          (_, v) => upper(v)),
        (k, _) => concat(lit("p_"), k)),
      map(lit("p_bucket"), pmod(col("p_partkey"), lit(7)).cast("string")))
    p.select(col("p_partkey"), explode(shaped).as(Seq("key", "value")))
      .filter(pmod(col("p_partkey"), lit(3)) === 0)
      .orderBy(col("p_partkey"), col("key"))
  }

  private val q80Sql =
    """WITH e AS (
         SELECT p_partkey, 'p_size' AS key, upper(p_size::VARCHAR) AS value FROM part
         UNION ALL
         SELECT p_partkey, 'p_brand', upper(p_brand) FROM part
         UNION ALL
         SELECT p_partkey, 'p_bucket', (p_partkey % 7)::VARCHAR FROM part)
       SELECT p_partkey, key, value FROM e
       WHERE p_partkey % 3 = 0
       ORDER BY p_partkey, key"""

  // ---------------------------------------------------------------- q81
  /** URL parsing — parse_url HOST/PATH/QUERY-param extraction over a
    * deterministically synthesized URL per event (the events table has
    * no URL column; the synthesis IS part of the oracle contract). The
    * oracle re-parses with regexes, pinning Spark's parser behavior on
    * exact strings. Map-side only. */
  private def q81(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val url = concat(lit("https://ex.com/"), col("event_type"),
      lit("/page?uid="), col("user_id").cast("string"),
      lit("&v="), pmod(col("event_id"), lit(7)).cast("string"))
    e.withColumn("url", url)
      .select(
        col("event_id"),
        parse_url(col("url"), lit("HOST")).as("host"),
        parse_url(col("url"), lit("PATH")).as("path"),
        parse_url(col("url"), lit("QUERY"), lit("uid")).as("uid"),
        parse_url(col("url"), lit("QUERY"), lit("v")).as("v"))
      .filter(pmod(col("event_id"), lit(37)) === 0)
      .orderBy(col("event_id"))
  }

  private val q81Sql =
    """WITH u AS (
         SELECT event_id,
           'https://ex.com/' || event_type || '/page?uid=' || user_id ||
             '&v=' || (event_id % 7) AS url
         FROM events)
       SELECT event_id,
         regexp_extract(url, 'https://([^/]+)/', 1) AS host,
         regexp_extract(url, 'https://[^/]+(/[^?]*)', 1) AS path,
         regexp_extract(url, 'uid=([0-9]+)', 1) AS uid,
         regexp_extract(url, 'v=([0-9]+)', 1) AS v
       FROM u WHERE event_id % 37 = 0 ORDER BY event_id"""

  // ---------------------------------------------------------------- q82
  /** Generator pair: stack() row-expands fixed price tiers and
    * inline() explodes an array<struct> built per row — both feed one
    * aggregate. Generators run inside codegen (no UDTF boundary); the
    * only shuffle is the final small groupBy. */
  private def q82(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir)("part")
    val stacked = p.selectExpr("p_partkey",
      "stack(2, 'retail', p_retailprice, 'half', p_retailprice / 2) AS (tier, price)")
    val inlined = p.selectExpr("p_partkey",
      """inline(array(
           named_struct('tier', 'taxed', 'price', p_retailprice * 1.1),
           named_struct('tier', 'clearance', 'price', p_retailprice * 0.25)))""")
    stacked.unionByName(inlined)
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"),
           round(avg(col("price")), 4).as("avg_price"),
           round(max(col("price")), 4).as("max_price"))
      .orderBy(col("tier"))
  }

  private val q82Sql =
    """WITH t AS (
         SELECT 'retail' AS tier, p_retailprice AS price FROM part
         UNION ALL SELECT 'half', p_retailprice / 2 FROM part
         UNION ALL SELECT 'taxed', p_retailprice * 1.1 FROM part
         UNION ALL SELECT 'clearance', p_retailprice * 0.25 FROM part)
       SELECT tier, count(*) AS n,
         round(avg(price), 4) AS avg_price,
         round(max(price), 4) AS max_price
       FROM t GROUP BY tier ORDER BY tier"""

  // ---------------------------------------------------------------- q83
  /** Exact distinct counting via bitmaps — bitmap_bit_position /
    * bitmap_construct_agg / bitmap_count, re-aggregated across
    * bitmap_bucket_number buckets. Same answer as count(DISTINCT) but
    * the shuffle payload is fixed-width 4 KB bitmaps instead of one
    * row per distinct key — the 100 TB shape for high-cardinality
    * distinct counts (bounded state, map-side combinable, mergeable
    * across partitions/segments). Oracle: plain count(DISTINCT). */
  private def q83(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    o.groupBy(col("o_orderstatus"), bitmap_bucket_number(col("o_custkey")).as("b"))
      .agg(bitmap_count(bitmap_construct_agg(bitmap_bit_position(col("o_custkey"))))
        .as("cnt"))
      .groupBy(col("o_orderstatus"))
      .agg(sum(col("cnt")).as("n_cust"))
      .orderBy(col("o_orderstatus"))
  }

  private val q83Sql =
    """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_cust
       FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  // ---------------------------------------------------------------- q85
  /** Custom DataSource V2 scan ([[graft.sources.GraftRangeSource]]) —
    * the filter on `id` is pushed into the connector (partitions
    * outside [25000, 75000) are never planned) and only the projected
    * columns are materialized. The double-sum is rounded to 4 decimals
    * so partition-order float accumulation can't flip the compare;
    * min/max/count are order-exact. Oracle rebuilds the deterministic
    * value formula over DuckDB's range(). */
  private def q85(s: SparkSession, dir: String): DataFrame =
    s.read.format("graft.sources.GraftRangeSource")
      .option("end", 100000).option("slices", 16).load()
      .filter(col("id") >= 25000 && col("id") < 75000)
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("val")), 4).as("sum_val"),
           round(min(col("val")), 6).as("min_val"),
           round(max(col("val")), 6).as("max_val"))
      .orderBy(col("bucket"))

  private val q85Sql =
    """WITH t AS (
         SELECT range AS id,
           ((range * 2654435761) % 1000003) / 1000003.0 AS val,
           CAST(range % 32 AS INT) AS bucket
         FROM range(25000, 75000))
       SELECT bucket, count(*) AS n,
         round(sum(val), 4) AS sum_val,
         round(min(val), 6) AS min_val,
         round(max(val), 6) AS max_val
       FROM t GROUP BY bucket ORDER BY bucket"""

  override def queries: Map[String, QueryFn] = Map(
    "q80_map_funcs"       -> q80 _,
    "q81_url_funcs"       -> q81 _,
    "q82_stack_inline"    -> q82 _,
    "q83_bitmap_distinct" -> q83 _,
    "q85_dsv2_range"      -> q85 _)

  override def oracles: Map[String, String] = Map(
    "q80_map_funcs"       -> q80Sql,
    "q81_url_funcs"       -> q81Sql,
    "q82_stack_inline"    -> q82Sql,
    "q83_bitmap_distinct" -> q83Sql,
    "q85_dsv2_range"      -> q85Sql)
}
