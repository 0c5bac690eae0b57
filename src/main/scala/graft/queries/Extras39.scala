package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 35: TPC-H Q11 and Q16 over a DERIVED partsupp
  * (the testdata has no partsupp table, so the observed offer book
  * stands in: supply cost = the pair's minimum unit price, availqty =
  * shipped quantity). With these, every TPC-H query shape (Q1-Q22) has
  * a graft twin.
  */
object Extras39 extends QueryPack {

  /** Derived partsupp: one row per observed (part, supplier) pair with
    * its exact-cents inventory value. min and sum are both
    * order-independent, so vc is engine-stable. */
  private def partsuppValue(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("lineitem")
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(floor(min(col("l_extendedprice") / col("l_quantity"))
        * sum(col("l_quantity")) * 100 + 0.5).as("vc"))

  // --------------------------------------------------------------- q265
  /** TPC-H Q11 shape (important stock): parts whose inventory value
    * exceeds 1.4x the average part's (the spec's SF-scaled fraction
    * made scale-free). The 1-row total broadcasts back against the
    * already-reduced pair values — no second lineitem scan. */
  private def q265(s: SparkSession, dir: String): DataFrame = {
    val ps = partsuppValue(s, dir)
    val tot = ps.agg(sum(col("vc")).as("tv"),
      countDistinct(col("pk")).as("np"))
    ps.crossJoin(broadcast(tot))
      .groupBy("pk", "tv", "np")
      .agg(sum(col("vc")).as("sv"))
      .filter(col("sv") > lit(1.4) * col("tv") / col("np"))
      .select(col("pk").as("p_partkey"),
        round(col("sv") / 100, 2).as("value"))
      .orderBy(desc("value"), col("p_partkey"))
      .limit(100)
  }

  private val q265Sql =
    """WITH ps AS (
         SELECT l_partkey AS pk, l_suppkey AS sk,
                floor(min(l_extendedprice / l_quantity)
                      * sum(l_quantity) * 100 + 0.5) AS vc
         FROM lineitem GROUP BY 1, 2),
       tot AS (SELECT sum(vc) AS tv, count(DISTINCT pk) AS np FROM ps)
       SELECT pk AS p_partkey, round(sum(vc) / 100, 2) AS value
       FROM ps CROSS JOIN tot
       GROUP BY pk, tv, np
       HAVING sum(vc) > 1.4 * tv / np
       ORDER BY value DESC, p_partkey LIMIT 100"""

  // --------------------------------------------------------------- q266
  /** TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    * counts per (brand, type, size) over filtered parts, excluding
    * flagged suppliers (negative balance stands in for the complaints
    * filter) — the NOT IN becomes a left-anti join before the distinct
    * count. */
  private def q266(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val ps = t("lineitem")
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .distinct()
    val flagged = t("supplier").filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    ps.join(flagged, col("sk") === col("s_suppkey"), "left_anti")
      .join(broadcast(t("part")
          .filter(col("p_brand") =!= "Brand#15" &&
            col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40))),
        col("pk") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("sk")).as("supplier_cnt"))
      .orderBy(desc("supplier_cnt"), col("p_brand"), col("p_type"),
        col("p_size"))
      .limit(100)
  }

  private val q266Sql =
    """WITH ps AS (
         SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem)
       SELECT p_brand, p_type, p_size,
              CAST(count(DISTINCT sk) AS BIGINT) AS supplier_cnt
       FROM ps JOIN part ON pk = p_partkey
       WHERE p_brand <> 'Brand#15'
         AND p_size IN (5, 10, 15, 20, 25, 30, 35, 40)
         AND sk NOT IN (SELECT s_suppkey FROM supplier
                        WHERE s_acctbal < 0)
       GROUP BY 1, 2, 3
       ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100"""

  override def queries: Map[String, QueryFn] = Map(
    "q265_tpch_q11" -> q265 _,
    "q266_tpch_q16" -> q266 _)

  override def oracles: Map[String, String] = Map(
    "q265_tpch_q11" -> q265Sql,
    "q266_tpch_q16" -> q266Sql)
}
