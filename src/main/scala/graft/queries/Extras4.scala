package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Round-3 surface, part 4 — the Spark-4-specific SQL surface (ANSI
  * try_* arithmetic, collations, parameterized SQL, transpose) plus
  * crosstab, explode_outer null preservation, from_xml, and the JSON
  * string-extraction family. All DuckDB-oracled.
  */
object Extras4 extends QueryPack {

  // ---------------------------------------------------------------- q92
  /** ANSI-mode-safe try_* arithmetic: try_divide returns NULL on /0
    * instead of raising (Spark 4 runs ANSI by default — the error-safe
    * variants are the scale-friendly way to keep a 100 TB job from
    * dying on one bad row). */
  private def q92(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir)("lineitem")
    val denom = pmod(col("l_orderkey"), lit(4))
    l.select(col("l_returnflag"),
             try_divide(col("l_extendedprice"), denom.cast("double")).as("unit"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           count(col("unit")).as("n_divisible"),
           round(sum(col("unit")), 2).as("sum_unit"))
      .orderBy(col("l_returnflag"))
  }

  private val q92Sql =
    """SELECT l_returnflag, count(*) AS n,
         count(CASE WHEN l_orderkey % 4 <> 0
                    THEN l_extendedprice / (l_orderkey % 4) END) AS n_divisible,
         round(sum(CASE WHEN l_orderkey % 4 <> 0
                        THEN l_extendedprice / (l_orderkey % 4) END), 2) AS sum_unit
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------------------------------------------------------------- q93
  /** Collation-aware comparison (Spark 4 collation support): equality
    * and prefix matching under UTF8_LCASE without materializing a
    * lowercased copy — the collation rides the type, so the optimizer
    * can still prune/push the predicate. */
  private def q93(s: SparkSession, dir: String): DataFrame = {
    val p = Tables(s, dir)("part")
    p.select(col("p_brand"),
             collate(col("p_type"), "UTF8_LCASE").as("t"))
      .filter(col("t").startsWith("SMALL") || col("t") === lit("standard brushed tin"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"))
      .orderBy(col("p_brand"))
  }

  private val q93Sql =
    """SELECT p_brand, count(*) AS n_parts FROM part
       WHERE lower(p_type) LIKE lower('SMALL%')
          OR lower(p_type) = 'standard brushed tin'
       GROUP BY p_brand ORDER BY p_brand"""

  // ---------------------------------------------------------------- q94
  /** Parameterized SQL (named parameter markers, Spark 4): the
    * injection-safe programmatic query surface — parameters bind as
    * typed literals, so the plan is identical to inlined constants
    * (constant folding and pushdown still apply). */
  private def q94(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir)("orders").createOrReplaceTempView("q94_orders")
    s.sql(
      """SELECT o_orderstatus, count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
         FROM q94_orders
         WHERE o_totalprice > :minp AND o_orderpriority = :prio
         GROUP BY o_orderstatus ORDER BY o_orderstatus""",
      Map("minp" -> 50000, "prio" -> "1-URGENT"))
  }

  private val q94Sql =
    """SELECT o_orderstatus, count(*) AS n, round(avg(o_totalprice), 4) AS avg_price
       FROM orders
       WHERE o_totalprice > 50000 AND o_orderpriority = '1-URGENT'
       GROUP BY o_orderstatus ORDER BY o_orderstatus"""

  // ---------------------------------------------------------------- q95
  /** Dataset.transpose (Spark 4): metric rows ⇄ status columns over a
    * 3-row aggregate — the frame-reshape primitive. */
  private def q95(s: SparkSession, dir: String): DataFrame = {
    val agg = Tables(s, dir)("orders")
      .groupBy(col("o_orderstatus"))
      .agg(round(count(lit(1)).cast("double"), 1).as("n_orders"),
           round(avg(col("o_totalprice")), 4).as("avg_price"))
      .orderBy(col("o_orderstatus"))
    agg.transpose(col("o_orderstatus"))
      .orderBy(col("key"))
  }

  private val q95Sql =
    """WITH a AS (
         SELECT o_orderstatus, round(count(*) * 1.0, 1) AS n_orders,
                round(avg(o_totalprice), 4) AS avg_price
         FROM orders GROUP BY o_orderstatus)
       SELECT 'avg_price' AS key,
         (SELECT avg_price FROM a WHERE o_orderstatus='F') AS "F",
         (SELECT avg_price FROM a WHERE o_orderstatus='O') AS "O",
         (SELECT avg_price FROM a WHERE o_orderstatus='P') AS "P"
       UNION ALL
       SELECT 'n_orders',
         (SELECT n_orders FROM a WHERE o_orderstatus='F'),
         (SELECT n_orders FROM a WHERE o_orderstatus='O'),
         (SELECT n_orders FROM a WHERE o_orderstatus='P')
       ORDER BY key"""

  // ---------------------------------------------------------------- q96
  /** df.stat.crosstab — contingency table as a DataFrame (pair-count
    * pivot in one pass). Column order is engine-defined; the driver's
    * compare sorts columns by name, so only the VALUES must line up. */
  private def q96(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("orders").stat
      .crosstab("o_orderstatus", "o_orderpriority")
      .orderBy(col("o_orderstatus_o_orderpriority"))

  private val q96Sql =
    """SELECT o_orderstatus AS o_orderstatus_o_orderpriority,
         CAST(count_if(o_orderpriority = '1-URGENT') AS BIGINT) AS "1-URGENT",
         CAST(count_if(o_orderpriority = '2-HIGH') AS BIGINT) AS "2-HIGH",
         CAST(count_if(o_orderpriority = '3-MEDIUM') AS BIGINT) AS "3-MEDIUM",
         CAST(count_if(o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS "4-NOT SPECIFIED",
         CAST(count_if(o_orderpriority = '5-LOW') AS BIGINT) AS "5-LOW"
       FROM orders GROUP BY o_orderstatus
       ORDER BY o_orderstatus_o_orderpriority"""

  // ---------------------------------------------------------------- q97
  /** explode_outer — generator null-preservation semantics: documents
    * whose filtered token array is EMPTY survive as a null row (plain
    * explode would drop them), so per-language totals keep every doc. */
  private def q97(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val thes = filter(split(trim(col("text")), "\\s+"), t => t === "the")
    d.select(col("lang"), explode_outer(thes).as("tok"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_rows"),
           count(col("tok")).as("n_the"),
           count_if(col("tok").isNull).as("n_docs_without"))
      .orderBy(col("lang"))
  }

  private val q97Sql =
    """WITH t AS (
         SELECT lang,
           len(list_filter(regexp_split_to_array(trim(text), '\s+'),
               x -> x = 'the')) AS n
         FROM documents)
       SELECT lang,
         CAST(sum(CASE WHEN n = 0 THEN 1 ELSE n END) AS BIGINT) AS n_rows,
         CAST(sum(n) AS BIGINT) AS n_the,
         CAST(count_if(n = 0) AS BIGINT) AS n_docs_without
       FROM t GROUP BY lang ORDER BY lang"""

  // ---------------------------------------------------------------- q98
  /** from_xml (Spark 4) — parse a deterministic XML envelope per event
    * into a typed struct; the oracle re-extracts the fields with
    * regexes, pinning the parser on exact values. */
  private def q98(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val xml = concat(lit("<ev><id>"), col("event_id"),
      lit("</id><ty>"), col("event_type"), lit("</ty><v>"),
      round(col("value"), 4), lit("</v></ev>"))
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("ty", StringType),
      StructField("v", DoubleType)))
    e.withColumn("x", from_xml(xml, lit(schema.toDDL)))
      .filter(pmod(col("event_id"), lit(41)) === 0)
      .select(col("x.id").as("id"), col("x.ty").as("ty"), col("x.v").as("v"))
      .orderBy(col("id"))
  }

  private val q98Sql =
    """WITH x AS (
         SELECT '<ev><id>' || event_id || '</id><ty>' || event_type ||
                '</ty><v>' || round(value, 4) || '</v></ev>' AS s
         FROM events WHERE event_id % 41 = 0)
       SELECT CAST(regexp_extract(s, '<id>(-?[0-9]+)</id>', 1) AS BIGINT) AS id,
         regexp_extract(s, '<ty>(.*?)</ty>', 1) AS ty,
         CAST(regexp_extract(s, '<v>(-?[0-9.]+)</v>', 1) AS DOUBLE) AS v
       FROM x ORDER BY id"""

  // ---------------------------------------------------------------- q99
  /** JSON string extraction without full parsing: get_json_object +
    * json_tuple over the events props column (the "peek one field out
    * of a JSON blob" fast path — no schema, no struct materialization). */
  private def q99(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    e.select(col("event_type"),
             get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
           min(col("k")).as("min_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  private val q99Sql =
    """WITH j AS (
         SELECT event_type,
           CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS INT) AS k
         FROM events)
       SELECT event_type, count(*) AS n,
         CAST(sum(k) AS BIGINT) AS sum_k, min(k) AS min_k, max(k) AS max_k
       FROM j GROUP BY event_type ORDER BY event_type"""

  // --------------------------------------------------------------- q101
  /** CDC merge (apply-changes / MERGE INTO shape): a deterministic
    * change feed — deletes (key%10=0), updates (key%10∈{1,2}), inserts
    * (new keys), plus a LATER delete for key%20=1 so latest-change-wins
    * is exercised — applied to the customer snapshot through
    * [[graft.operators.CdcMerge]] (argmax dedup + one full-outer
    * join). */
  private def q101(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir)("customer")
    val base = c.select(col("c_custkey"), col("c_name"), col("c_acctbal"))
    val k = col("c_custkey")
    val changes =
      c.filter(pmod(k, lit(10)) === 0)
        .select(k, lit("D").as("op"), lit(1).as("seq"), col("c_name"), col("c_acctbal"))
      .unionByName(c.filter(pmod(k, lit(10)).isin(1, 2))
        .select(k, lit("U").as("op"), lit(1).as("seq"),
                concat(lit("upd_"), k.cast("string")).as("c_name"),
                (col("c_acctbal") + 100).as("c_acctbal")))
      .unionByName(c.filter(pmod(k, lit(10)) === 7)
        .select((k + 1000000).as("c_custkey"), lit("I").as("op"), lit(1).as("seq"),
                concat(lit("new_"), k.cast("string")).as("c_name"),
                lit(1.0).as("c_acctbal")))
      .unionByName(c.filter(pmod(k, lit(20)) === 1)
        .select(k, lit("D").as("op"), lit(2).as("seq"),
                lit(null).cast("string").as("c_name"),
                lit(null).cast("double").as("c_acctbal")))
    graft.operators.CdcMerge(base, changes, "c_custkey")
      .orderBy(col("c_custkey"))
  }

  private val q101Sql =
    """WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer),
       changes AS (
         SELECT c_custkey, 'D' AS op, 1 AS seq, c_name, c_acctbal
         FROM customer WHERE c_custkey % 10 = 0
         UNION ALL
         SELECT c_custkey, 'U', 1, 'upd_' || c_custkey, c_acctbal + 100
         FROM customer WHERE c_custkey % 10 IN (1, 2)
         UNION ALL
         SELECT c_custkey + 1000000, 'I', 1, 'new_' || c_custkey, 1.0
         FROM customer WHERE c_custkey % 10 = 7
         UNION ALL
         SELECT c_custkey, 'D', 2, NULL, NULL
         FROM customer WHERE c_custkey % 20 = 1),
       latest AS (
         SELECT * FROM (
           SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
           FROM changes) WHERE rn = 1)
       SELECT coalesce(b.c_custkey, l.c_custkey) AS c_custkey,
         CASE WHEN l.op IS NOT NULL THEN l.c_name ELSE b.c_name END AS c_name,
         CASE WHEN l.op IS NOT NULL THEN l.c_acctbal ELSE b.c_acctbal END AS c_acctbal
       FROM base b FULL OUTER JOIN latest l ON b.c_custkey = l.c_custkey
       WHERE l.op IS NULL OR l.op <> 'D'
       ORDER BY c_custkey"""

  // --------------------------------------------------------------- q102
  /** HLL sketches as mergeable distinct-count STATE (DataSketches,
    * Spark 3.5+): per-status sketches built with hll_sketch_agg, then
    * re-merged with hll_union_agg — the two-level rollup every
    * pre-aggregated dashboard pipeline runs (sketch once per segment,
    * union on demand; sketches shuffle as ~KB binaries). At the test
    * cardinality (≤ 200 distinct) the sketch is in its exact coupon
    * regime, so plain count(DISTINCT) is a valid oracle — the
    * approximate regime is covered by q39's approx_count_distinct. */
  private def q102(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val perStatus = o
      .groupBy(col("o_orderstatus"))
      .agg(hll_sketch_agg(pmod(col("o_custkey"), lit(200)), lit(14)).as("sk"))
    val statusRows = perStatus.select(col("o_orderstatus"),
      hll_sketch_estimate(col("sk")).as("n_distinct"))
    val unionRow = perStatus.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("n_distinct"))
      .select(lit("ALL").as("o_orderstatus"), col("n_distinct"))
    statusRows.unionByName(unionRow).orderBy(col("o_orderstatus"))
  }

  private val q102Sql =
    """SELECT o_orderstatus, count(DISTINCT o_custkey % 200) AS n_distinct
       FROM orders GROUP BY o_orderstatus
       UNION ALL
       SELECT 'ALL', count(DISTINCT o_custkey % 200) FROM orders
       ORDER BY o_orderstatus"""

  override def queries: Map[String, QueryFn] = Map(
    "q92_try_arith"     -> q92 _,
    "q93_collation"     -> q93 _,
    "q94_param_sql"     -> q94 _,
    "q95_transpose"     -> q95 _,
    "q96_crosstab"      -> q96 _,
    "q97_explode_outer" -> q97 _,
    "q98_from_xml"      -> q98 _,
    "q99_json_extract"  -> q99 _,
    "q101_cdc_merge"    -> q101 _,
    "q102_hll_sketch"   -> q102 _)

  override def oracles: Map[String, String] = Map(
    "q92_try_arith"     -> q92Sql,
    "q93_collation"     -> q93Sql,
    "q94_param_sql"     -> q94Sql,
    "q95_transpose"     -> q95Sql,
    "q96_crosstab"      -> q96Sql,
    "q97_explode_outer" -> q97Sql,
    "q98_from_xml"      -> q98Sql,
    "q99_json_extract"  -> q99Sql,
    "q101_cdc_merge"    -> q101Sql,
    "q102_hll_sketch"   -> q102Sql)
}
