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

  override val queries: Map[String, QueryFn] = Map("q38_sql_surface" -> q38 _)
  override val oracles: Map[String, String]  = Map("q38_sql_surface" -> q38Sql)
}
