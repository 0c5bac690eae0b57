package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 22: more TPC-H benchmark shapes (Q3 / Q7 /
  * Q18) adapted to the testdata schema.
  */
object Extras26 extends QueryPack {

  // --------------------------------------------------------------- q208
  /** TPC-H Q3 shape (shipping priority): revenue of orders placed
    * before a date but shipped after it, top 10 — the classic
    * date-straddle join with filters pushed to both scans. */
  private def q208(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t("lineitem").filter(to_date(col("l_shipdate")) > "1996-06-30")
      .join(t("orders").filter(to_date(col("o_orderdate")) < "1996-07-01"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100 + 0.5)) / 100).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  private val q208Sql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
              sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5))
                / 100 AS revenue
       FROM lineitem JOIN orders ON l_orderkey = o_orderkey
       WHERE CAST(l_shipdate AS DATE) > DATE '1996-06-30'
         AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
       GROUP BY 1, 2, 3
       ORDER BY revenue DESC, l_orderkey LIMIT 10"""

  // --------------------------------------------------------------- q209
  /** TPC-H Q7 shape (volume shipping): trade volume between ordered
    * nation pairs per year — the bidirectional join where both the
    * customer and supplier nations come from broadcast dims and the
    * pair filter keeps only cross-nation flow. */
  private def q209(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val n1 = t("nation").select(col("n_nationkey").as("ck"),
      col("n_name").as("cust_nation"))
    val n2 = t("nation").select(col("n_nationkey").as("sk"),
      col("n_name").as("supp_nation"))
    t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n1), col("c_nationkey") === col("ck"))
      .join(broadcast(n2), col("s_nationkey") === col("sk"))
      .filter(col("cust_nation") < col("supp_nation"))
      .filter(year(col("o_orderdate")).between(1996, 1997))
      .groupBy(col("cust_nation"), col("supp_nation"),
        year(col("o_orderdate")).as("yr"))
      .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100 + 0.5)) / 100).as("volume"))
      .filter(col("volume") > 500000)
      .orderBy("cust_nation", "supp_nation", "yr")
  }

  private val q209Sql =
    """SELECT n1.n_name AS cust_nation, n2.n_name AS supp_nation,
              year(o_orderdate) AS yr,
              sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5))
                / 100 AS volume
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation n1 ON c_nationkey = n1.n_nationkey
       JOIN nation n2 ON s_nationkey = n2.n_nationkey
       WHERE n1.n_name < n2.n_name
         AND year(o_orderdate) BETWEEN 1996 AND 1997
       GROUP BY 1, 2, 3
       HAVING sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5))
                / 100 > 500000
       ORDER BY 1, 2, 3"""

  // --------------------------------------------------------------- q210
  /** TPC-H Q18 shape (large-volume customers): orders whose total
    * quantity exceeds a threshold, with customer context — the HAVING
    * semi-join pattern: the order-grain aggregate gates which orders
    * ever reach the enrichment joins. */
  private def q210(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val big = t("lineitem").groupBy("l_orderkey")
      .agg(round(sum("l_quantity"), 2).as("total_qty"))
      .filter(col("total_qty") > 250)
    big.join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("l_orderkey"),
        col("o_orderdate"), round(col("o_totalprice"), 2).as("o_totalprice"),
        col("total_qty"))
      .orderBy(desc("total_qty"), col("l_orderkey"))
      .limit(25)
  }

  private val q210Sql =
    """WITH big AS (
         SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
         FROM lineitem GROUP BY 1
         HAVING round(sum(l_quantity), 2) > 250)
       SELECT c_custkey, c_name, l_orderkey, o_orderdate,
              round(o_totalprice, 2) AS o_totalprice, total_qty
       FROM big
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       ORDER BY total_qty DESC, l_orderkey LIMIT 25"""

  override def queries: Map[String, QueryFn] = Map(
    "q208_tpch_q3"  -> q208 _,
    "q209_tpch_q7"  -> q209 _,
    "q210_tpch_q18" -> q210 _)

  override def oracles: Map[String, String] = Map(
    "q208_tpch_q3"  -> q208Sql,
    "q209_tpch_q7"  -> q209Sql,
    "q210_tpch_q18" -> q210Sql)
}
