package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Round-4 SQL surface: recursive CTEs (Spark 4), the SQL PIVOT
  * clause, and named WINDOW clauses. All DuckDB-oracled; the recursive
  * oracle uses DuckDB's own WITH RECURSIVE (same ANSI construct,
  * dialect-local date arithmetic).
  */
object Sql2 extends QueryPack {

  // --------------------------------------------------------------- q118
  /** Recursive CTE — the calendar-spine pattern: generate a 60-day date
    * spine anchored at the corpus' first ship date, then left-join the
    * per-day shipment counts onto it so gap days surface as zeros
    * (a plain GROUP BY silently drops them). Spark 4 executes the
    * recursion as an iterative UnionLoop with a recursion-depth cap —
    * the spine length is bounded and driver-side, the join stays
    * distributed. */
  private val q118Spark = """
      WITH RECURSIVE spine(i) AS (
        SELECT 0
        UNION ALL
        SELECT i + 1 FROM spine WHERE i < 59
      ),
      days AS (
        SELECT date_add((SELECT min(l_shipdate) FROM lineitem), i) AS d,
               i AS day_idx
        FROM spine
      )
      SELECT day_idx, d,
             CAST(count(l_orderkey) AS BIGINT) AS n_shipped
      FROM days LEFT JOIN lineitem ON l_shipdate = d
      GROUP BY day_idx, d
      ORDER BY day_idx
    """

  private def q118(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).registerAll()
    s.sql(q118Spark)
  }

  private val q118Sql = """
      WITH RECURSIVE spine(i) AS (
        SELECT 0
        UNION ALL
        SELECT i + 1 FROM spine WHERE i < 59
      ),
      days AS (
        SELECT (SELECT min(l_shipdate) FROM lineitem) + to_days(i) AS d,
               i AS day_idx
        FROM spine
      )
      SELECT day_idx, d,
             CAST(count(l_orderkey) AS BIGINT) AS n_shipped
      FROM days LEFT JOIN lineitem ON l_shipdate = d
      GROUP BY day_idx, d
      ORDER BY day_idx"""

  // --------------------------------------------------------------- q119
  /** SQL PIVOT clause — per-priority order counts fanned out to one
    * column per order status. The oracle spells the same pivot as
    * portable CASE aggregation with identical output aliases. */
  private def q119(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).registerAll()
    s.sql("""
      SELECT * FROM (
        SELECT o_orderpriority, o_orderstatus FROM orders)
      PIVOT (count(*) FOR o_orderstatus IN ('O' AS n_open, 'F' AS n_filled,
                                            'P' AS n_pending))
      ORDER BY o_orderpriority
    """)
  }

  private val q119Sql =
    """SELECT o_orderpriority,
         CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_open,
         CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_filled,
         CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_pending
       FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""

  // --------------------------------------------------------------- q120
  /** Named WINDOW clause — one window definition shared by several
    * analytic functions (rank + share-of-group), the readable form of
    * repeated OVER(...) specs. Same text runs in DuckDB. */
  private def q120(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir).registerAll()
    s.sql("""
      SELECT * FROM (
        SELECT o_orderpriority, o_orderkey,
               rank() OVER w AS rk,
               round(o_totalprice / sum(o_totalprice) OVER
                 (PARTITION BY o_orderpriority), 6) AS price_share
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rk <= 5
      ORDER BY o_orderpriority, rk
    """)
  }

  // same construct; DuckDB's rank() is BIGINT, so the oracle casts to
  // match Spark's int32
  private val q120Sql = """
      SELECT o_orderpriority, o_orderkey, CAST(rk AS INT) AS rk, price_share
      FROM (
        SELECT o_orderpriority, o_orderkey,
               rank() OVER w AS rk,
               round(o_totalprice / sum(o_totalprice) OVER
                 (PARTITION BY o_orderpriority), 6) AS price_share
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey))
      WHERE rk <= 5
      ORDER BY o_orderpriority, rk"""

  override def queries: Map[String, QueryFn] = Map(
    "q118_recursive_cte" -> q118,
    "q119_sql_pivot" -> q119,
    "q120_named_window" -> q120)

  override def oracles: Map[String, String] = Map(
    "q118_recursive_cte" -> q118Sql,
    "q119_sql_pivot" -> q119Sql,
    "q120_named_window" -> q120Sql)
}
