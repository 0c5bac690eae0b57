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

  override def queries: Map[String, QueryFn] = Map(
    "q103_bit_aggs"        -> q103 _,
    "q104_percentile_cont" -> q104 _,
    "q105_group_by_all"    -> q105 _,
    "q106_identifier"      -> q106 _)

  override def oracles: Map[String, String] = Map(
    "q103_bit_aggs"        -> q103Sql,
    "q104_percentile_cont" -> q104Sql,
    "q105_group_by_all"    -> q105Sql,
    "q106_identifier"      -> q106Sql)
}
