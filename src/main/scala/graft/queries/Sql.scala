package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** The SQL entry point (reference surface 3, SURVEY.md §3.3): tables
  * registered as temp views, query text through the Spark parser — the
  * NB:803 example-query shape, including a backtick-quoted column name
  * with a space (the engine requirement from SURVEY.md §1.3; DuckDB's
  * oracle spells the same identifier with double quotes). */
object Sql extends QueryPack {

  private def q38(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).registerAll()
    s.sql("""
      SELECT n_name AS `nation name`,
             round(max(o_totalprice), 4) AS max_price,
             count(*) AS n_orders
      FROM orders a
      JOIN customer c ON a.o_custkey = c.c_custkey
      JOIN nation b ON c.c_nationkey = b.n_nationkey
      GROUP BY `nation name`
      ORDER BY n_orders DESC, `nation name`
    """)
  }

  private val q38Sql =
    """SELECT n_name AS "nation name",
       round(max(o_totalprice), 4) AS max_price,
       count(*) AS n_orders
       FROM orders a
       JOIN customer c ON a.o_custkey = c.c_custkey
       JOIN nation b ON c.c_nationkey = b.n_nationkey
       GROUP BY "nation name"
       ORDER BY n_orders DESC, "nation name""""

  /** Subquery surface: scalar subquery (WHERE), correlated scalar
    * subquery (SELECT list), and correlated EXISTS in one statement —
    * Catalyst decorrelates all three into joins (RewriteCorrelated
    * ScalarSubquery / RewritePredicateSubquery), which is what makes
    * the nested form safe at scale: no per-row subquery execution
    * exists in the physical plan. The oracle is near-identical ANSI
    * text run by DuckDB. */
  private val subquerySql = """
      WITH big_cust AS (
        SELECT c_custkey, c_nationkey FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)),
      per_nation AS (
        SELECT n_name, n.n_nationkey AS nk, count(*) AS n_big_customers
        FROM big_cust b
        JOIN nation n ON b.c_nationkey = n.n_nationkey
        WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = b.c_custkey)
        GROUP BY n_name, n.n_nationkey)
      SELECT n_name, n_big_customers,
             (SELECT count(*) FROM supplier s
              WHERE s.s_nationkey = per_nation.nk) AS n_suppliers
      FROM per_nation
      ORDER BY n_name
    """

  private def q68(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).registerAll()
    s.sql(subquerySql)
  }

  /** Correlated LATERAL subquery — top-2 customers PER nation without a
    * window function: the lateral body re-evaluates per outer row and
    * Catalyst decorrelates it (DecorrelateInnerQuery) into a ranked
    * join, so the nested form plans set-based, not nested-loop. Same
    * ANSI text runs in DuckDB. */
  private val lateralSql = """
      SELECT n_name, c_name, round(c_acctbal, 4) AS acctbal
      FROM nation n,
      LATERAL (
        SELECT c_name, c_acctbal FROM customer c
        WHERE c.c_nationkey = n.n_nationkey
        ORDER BY c_acctbal DESC, c_custkey
        LIMIT 2
      ) top2
      ORDER BY n_name, acctbal DESC, c_name
    """

  private def q74(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).registerAll()
    s.sql(lateralSql)
  }

  override val queries: Map[String, QueryFn] = Map(
    "q38_sql_surface"    -> q38 _,
    "q68_sql_subqueries" -> q68 _,
    "q74_lateral_join"   -> q74 _)
  override val oracles: Map[String, String]  = Map(
    "q38_sql_surface"    -> q38Sql,
    "q68_sql_subqueries" -> subquerySql,
    "q74_lateral_join"   -> lateralSql)
}
