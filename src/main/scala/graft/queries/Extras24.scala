package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 20: TPC-H classics adapted to the testdata
  * schema — the recognizable multi-join benchmark shapes.
  */
object Extras24 extends QueryPack {

  // --------------------------------------------------------------- q203
  /** TPC-H Q5 shape (local supplier volume): revenue from orders where
    * customer and supplier share a nation, per region/nation, one year.
    * Five joins — three broadcast dims, one co-located fact-fact — and
    * the same-nation predicate applied as a join condition so the
    * mismatched pairs never reach the aggregate. */
  private def q203(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(t("region")), col("n_regionkey") === col("r_regionkey"))
      .filter(year(col("o_orderdate")) === 1996)
      .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"))
      .orderBy(desc("revenue"), col("region"), col("nation"))
  }

  private val q203Sql =
    """SELECT r_name AS region, n_name AS nation,
              round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN supplier ON l_suppkey = s_suppkey
                    AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE year(o_orderdate) = 1996
       GROUP BY 1, 2
       ORDER BY revenue DESC, region, nation"""

  // --------------------------------------------------------------- q204
  /** TPC-H Q10 shape (returned-item reporting): top 20 customers by
    * revenue lost to returns in a quarter. Fact-fact join on the order
    * key, return-flag filter pushed to the lineitem scan, customer and
    * nation dims broadcast into the reduced aggregate. */
  private def q204(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t("lineitem").filter(col("l_returnflag") === "R")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .filter(to_date(col("o_orderdate")).between("1996-01-01", "1996-03-31"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      // exact integer-cents accumulation: floor(x*100+0.5) is the same
      // double->long map in every engine, and integer sums are
      // order-independent - no summation-order ULP can flip the
      // round-to-cents result (it did, at sf0.01, with round(sum(),2))
      .agg((sum(floor(col("l_extendedprice") * (lit(1) - col("l_discount"))
          * 100 + 0.5)) / 100).as("revenue"),
        round(max(col("c_acctbal")), 2).as("acctbal"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  private val q204Sql =
    """SELECT c_custkey, c_name, n_name,
              sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5))
                / 100 AS revenue,
              round(max(c_acctbal), 2) AS acctbal
       FROM lineitem
       JOIN orders ON l_orderkey = o_orderkey
       JOIN customer ON o_custkey = c_custkey
       JOIN nation ON c_nationkey = n_nationkey
       WHERE l_returnflag = 'R'
         AND CAST(o_orderdate AS DATE)
             BETWEEN DATE '1996-01-01' AND DATE '1996-03-31'
       GROUP BY 1, 2, 3
       ORDER BY revenue DESC, c_custkey LIMIT 20"""

  override def queries: Map[String, QueryFn] = Map(
    "q203_tpch_q5"  -> q203 _,
    "q204_tpch_q10" -> q204 _)

  override def oracles: Map[String, String] = Map(
    "q203_tpch_q5"  -> q203Sql,
    "q204_tpch_q10" -> q204Sql)
}
