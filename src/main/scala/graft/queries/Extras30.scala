package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 26: customer-set churn, composition mixes,
  * and the array-sort top-k formulation.
  */
object Extras30 extends QueryPack {

  // --------------------------------------------------------------- q221
  /** Customer-set churn between 1996 and 1997: retained / lost / gained
    * counts from ONE full-outer join of the two per-year distinct sets
    * — the set-difference dashboard without three separate anti-joins. */
  private def q221(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    def actives(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    actives(1996).withColumn("a", lit(1))
      .join(actives(1997).withColumn("b", lit(1))
          .withColumnRenamed("o_custkey", "ck2"),
        col("o_custkey") === col("ck2"), "full_outer")
      .agg(
        sum(when(col("a").isNotNull && col("b").isNotNull, 1).otherwise(0))
          .as("retained"),
        sum(when(col("a").isNotNull && col("b").isNull, 1).otherwise(0))
          .as("lost"),
        sum(when(col("a").isNull && col("b").isNotNull, 1).otherwise(0))
          .as("gained"))
  }

  private val q221Sql =
    """WITH a AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE year(o_orderdate) = 1996),
       b AS (SELECT DISTINCT o_custkey FROM orders
             WHERE year(o_orderdate) = 1997)
       SELECT
         CAST(sum(CASE WHEN a.o_custkey IS NOT NULL
                        AND b.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS retained,
         CAST(sum(CASE WHEN a.o_custkey IS NOT NULL
                        AND b.o_custkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS lost,
         CAST(sum(CASE WHEN a.o_custkey IS NULL
                        AND b.o_custkey IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS gained
       FROM a FULL OUTER JOIN b ON a.o_custkey = b.o_custkey"""

  // --------------------------------------------------------------- q222
  /** Order-size composition by year: the share of small / medium /
    * large orders within each year — banding is map-side, the
    * within-year normalization is a window over the (year × band)
    * reduce. */
  private def q222(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val banded = o.select(year(col("o_orderdate")).as("yr"),
        when(col("o_totalprice") < 100000, "small")
          .when(col("o_totalprice") < 300000, "medium")
          .otherwise("large").as("band"))
      .groupBy("yr", "band").agg(count(lit(1)).as("n"))
    val wYr = Window.partitionBy("yr")
    banded
      .withColumn("pct", round(col("n") / sum("n").over(wYr), 6))
      .orderBy("yr", "band")
  }

  private val q222Sql =
    """WITH banded AS (
         SELECT year(o_orderdate) AS yr,
                CASE WHEN o_totalprice < 100000 THEN 'small'
                     WHEN o_totalprice < 300000 THEN 'medium'
                     ELSE 'large' END AS band,
                count(*) AS n
         FROM orders GROUP BY 1, 2)
       SELECT yr, band, n,
              round(n / sum(n) OVER (PARTITION BY yr), 6) AS pct
       FROM banded ORDER BY 1, 2"""

  // --------------------------------------------------------------- q223
  /** Top-3 orders per customer via collect_list + sort_array + slice —
    * the THIRD top-k formulation next to the window (q13) and the
    * bounded-heap Aggregator (q63). This form materializes each
    * group's rows into one array, so it is only safe when the
    * per-group cardinality is bounded (here ≤ ~40 orders/customer);
    * q63's heap is the unbounded-group answer. */
  private def q223(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders").filter(col("o_custkey") < 100)
    o.groupBy("o_custkey")
      .agg(slice(sort_array(collect_list(struct(
          (col("o_totalprice") * -1).as("neg"),
          col("o_orderkey"))), asc = true), 1, 3).as("top"))
      .select(col("o_custkey"), explode(col("top")).as("t"))
      .select(col("o_custkey"), col("t.o_orderkey").as("o_orderkey"),
        round(col("t.neg") * -1, 2).as("o_totalprice"))
      .orderBy("o_custkey", "o_orderkey")
  }

  private val q223Sql =
    """WITH ranked AS (
         SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey)
                  AS rn
         FROM orders WHERE o_custkey < 100)
       SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS o_totalprice
       FROM ranked WHERE rn <= 3
       ORDER BY o_custkey, o_orderkey"""

  override def queries: Map[String, QueryFn] = Map(
    "q221_customer_churn_sets" -> q221 _,
    "q222_order_mix"           -> q222 _,
    "q223_topk_arraysort"      -> q223 _)

  override def oracles: Map[String, String] = Map(
    "q221_customer_churn_sets" -> q221Sql,
    "q222_order_mix"           -> q222Sql,
    "q223_topk_arraysort"      -> q223Sql)
}
