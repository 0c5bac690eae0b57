package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 15: SQL dialect corners — aggregate FILTER
  * clauses, LIKE ANY pattern sets, NOT IN null semantics, and
  * map-typed lambda combination.
  */
object Extras19 extends QueryPack {

  // --------------------------------------------------------------- q182
  /** Aggregate FILTER (WHERE ...) clauses: one scan computing several
    * differently-filtered aggregates — the standard alternative to
    * CASE-wrapped inputs, and exactly one hash aggregate in the plan. */
  private def q182(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).registerAll()
    s.sql(
      """SELECT l_returnflag,
                count(*) AS n_all,
                count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
                round(sum(l_extendedprice) FILTER (WHERE l_quantity >= 30), 2)
                  AS rev_bulk,
                round(avg(l_tax) FILTER (WHERE l_linestatus = 'F'), 6)
                  AS avg_tax_f
         FROM lineitem GROUP BY 1 ORDER BY 1""")
  }

  private val q182Sql =
    """SELECT l_returnflag,
              count(*) AS n_all,
              count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
              round(sum(l_extendedprice) FILTER (WHERE l_quantity >= 30), 2)
                AS rev_bulk,
              round(avg(l_tax) FILTER (WHERE l_linestatus = 'F'), 6)
                AS avg_tax_f
       FROM lineitem GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q183
  /** LIKE ANY pattern sets (Spark dialect) vs the portable OR spelling
    * in the oracle — pattern-set filtering stays one codegen'd
    * predicate, no join against a pattern table. */
  private def q183(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).registerAll()
    s.sql(
      """SELECT p_partkey, p_name
         FROM part
         WHERE p_name LIKE ANY ('%red%', '%bolt%')
           AND p_partkey < 500
         ORDER BY p_partkey""")
  }

  private val q183Sql =
    """SELECT p_partkey, p_name
       FROM part
       WHERE (p_name LIKE '%red%' OR p_name LIKE '%bolt%')
         AND p_partkey < 500
       ORDER BY p_partkey"""

  // --------------------------------------------------------------- q184
  /** NOT IN with a nullable subquery — the ANSI trap: one NULL in the
    * subquery empties the NOT IN result, so the correct formulation
    * filters nulls explicitly. Pins that the engine implements
    * three-valued NOT IN, not the naive anti-join. */
  private def q184(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).registerAll()
    s.sql(
      """SELECT
           (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
             AS strict_not_in,
           (SELECT count(*) FROM customer
            WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL))
             AS null_safe_not_in,
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_custkey = c.c_custkey))
             AS not_exists""")
  }

  private val q184Sql =
    """SELECT
         (SELECT count(*) FROM customer
          WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
           AS strict_not_in,
         (SELECT count(*) FROM customer
          WHERE c_custkey NOT IN
            (SELECT o_custkey FROM orders WHERE o_custkey IS NOT NULL))
           AS null_safe_not_in,
         (SELECT count(*) FROM customer c
          WHERE NOT EXISTS (SELECT 1 FROM orders o
                            WHERE o.o_custkey = c.c_custkey))
           AS not_exists"""

  // --------------------------------------------------------------- q185
  /** map_zip_with: combine two per-status maps (counts and revenue)
    * built by map_from_entries over grouped rows into one map of
    * rounded revenue-per-line ratios, then explode for the compare. */
  private def q185(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir)("lineitem")
    val grouped = li.groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"),
           sum(col("l_extendedprice")).as("rev"))
      .groupBy("l_returnflag")
      .agg(map_from_entries(collect_list(struct(col("l_linestatus"), col("n"))))
             .as("counts"),
           map_from_entries(collect_list(struct(col("l_linestatus"), col("rev"))))
             .as("revs"))
    grouped.select(col("l_returnflag"),
        explode(expr(
          "map_zip_with(counts, revs, (k, c, r) -> round(r / c, 4))"))
          .as(Seq("l_linestatus", "rev_per_line")))
      .orderBy("l_returnflag", "l_linestatus")
  }

  private val q185Sql =
    """SELECT l_returnflag, l_linestatus,
              round(sum(l_extendedprice) / count(*), 4) AS rev_per_line
       FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2"""

  override def queries: Map[String, QueryFn] = Map(
    "q182_filter_clause" -> q182 _,
    "q183_like_any"      -> q183 _,
    "q184_not_in_nulls"  -> q184 _,
    "q185_map_zip_with"  -> q185 _)

  override def oracles: Map[String, String] = Map(
    "q182_filter_clause" -> q182Sql,
    "q183_like_any"      -> q183Sql,
    "q184_not_in_nulls"  -> q184Sql,
    "q185_map_zip_with"  -> q185Sql)
}
