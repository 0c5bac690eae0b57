package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 36: experiment assignment, snapshot
  * reconciliation, weighted median, 2-D density binning.
  */
object Extras40 extends QueryPack {

  private def cents(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5)

  // --------------------------------------------------------------- q267
  /** Deterministic hash-based experiment assignment (md5 of the user
    * key, the q76 sampling trick as variant routing) and the variant
    * readout — assignment is reproducible across engines and runs, no
    * RNG anywhere. */
  private def q267(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val assigned = e.select("user_id").distinct()
      .withColumn("variant",
        when(ascii(substring(md5(col("user_id").cast("string")), 1, 1))
          % 2 === 0, "control").otherwise("treatment"))
    val metrics = e.join(assigned, "user_id")
      .groupBy("variant", "user_id")
      .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
        .as("purchases"),
        count(lit(1)).as("events"))
    metrics.groupBy("variant")
      .agg(count(lit(1)).as("n_users"),
        sum(col("purchases")).as("purchases"),
        round(sum(col("purchases")) / sum(col("events")).cast("double"), 6)
          .as("purchase_rate"))
      .orderBy("variant")
  }

  private val q267Sql =
    """WITH assigned AS (
         SELECT user_id,
                CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1))
                          % 2 = 0
                     THEN 'control' ELSE 'treatment' END AS variant
         FROM (SELECT DISTINCT user_id FROM events)),
       metrics AS (
         SELECT a.variant, e.user_id,
                sum(CASE WHEN e.event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS purchases,
                count(*) AS events
         FROM events e JOIN assigned a ON e.user_id = a.user_id
         GROUP BY 1, 2)
       SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
              CAST(sum(purchases) AS BIGINT) AS purchases,
              round(sum(purchases) / sum(events)::DOUBLE, 6)
                AS purchase_rate
       FROM metrics GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q268
  /** Snapshot reconciliation: the per-customer aggregate state before
    * a cutoff vs now, classified added / grew / unchanged with the
    * revenue delta — the data-diff audit between two pipeline runs,
    * one outer join of two reduces. */
  private def q268(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val before = o.filter(to_date(col("o_orderdate")) < "1999-01-01")
      .groupBy(col("o_custkey").as("bk"))
      .agg(sum(cents(col("o_totalprice"))).as("bc"),
        count(lit(1)).as("bn"))
    val after = o.groupBy("o_custkey")
      .agg(sum(cents(col("o_totalprice"))).as("ac"),
        count(lit(1)).as("an"))
    after.join(before, col("o_custkey") === col("bk"), "left_outer")
      .withColumn("status",
        when(col("bk").isNull, "added")
          .when(col("an") === col("bn"), "unchanged")
          .otherwise("grew"))
      .groupBy("status")
      .agg(count(lit(1)).as("n_customers"),
        round(coalesce(sum(col("ac") - coalesce(col("bc"), lit(0L))),
          lit(0L)) / 100, 2).as("revenue_delta"))
      .orderBy("status")
  }

  private val q268Sql =
    """WITH before AS (
         SELECT o_custkey, sum(floor(o_totalprice * 100 + 0.5)) AS c,
                count(*) AS n
         FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1999-01-01'
         GROUP BY 1),
       after AS (
         SELECT o_custkey, sum(floor(o_totalprice * 100 + 0.5)) AS c,
                count(*) AS n
         FROM orders GROUP BY 1)
       SELECT CASE WHEN b.o_custkey IS NULL THEN 'added'
                   WHEN a.n = b.n THEN 'unchanged'
                   ELSE 'grew' END AS status,
              CAST(count(*) AS BIGINT) AS n_customers,
              round(coalesce(sum(a.c - coalesce(b.c, 0)), 0) / 100, 2)
                AS revenue_delta
       FROM after a LEFT JOIN before b ON a.o_custkey = b.o_custkey
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q269
  /** Quantity-weighted median unit price per brand: cumulative weight
    * over the price-ordered rows, first price at or past half the
    * total weight. Integral weights keep the running sums exact; the
    * crossing price is permutation-invariant under ties. */
  private def q269(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val pts = t("lineitem")
      .join(broadcast(t("part")), col("p_partkey") === col("l_partkey"))
      .select(col("p_brand"),
        (col("l_extendedprice") / col("l_quantity")).as("price"),
        col("l_quantity").as("w"))
    val cum = Window.partitionBy("p_brand").orderBy("price", "w")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.partitionBy("p_brand")
    pts.withColumn("cw", sum(col("w")).over(cum))
      .withColumn("tw", sum(col("w")).over(whole))
      .filter(col("cw") >= col("tw") / 2)
      .groupBy("p_brand")
      .agg(round(min(col("price")), 4).as("weighted_median"))
      .orderBy("p_brand")
  }

  private val q269Sql =
    """WITH pts AS (
         SELECT p_brand, l_extendedprice / l_quantity AS price,
                l_quantity AS w
         FROM lineitem JOIN part ON p_partkey = l_partkey),
       ordered AS (
         SELECT p_brand, price, w,
                sum(w) OVER (PARTITION BY p_brand ORDER BY price, w
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS cw,
                sum(w) OVER (PARTITION BY p_brand) AS tw
         FROM pts)
       SELECT p_brand, round(min(price), 4) AS weighted_median
       FROM ordered WHERE cw >= tw / 2
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q270
  /** 2-D density grid (quantity band x discount band) with per-cell
    * revenue — the heatmap reduce, pure map-side banding into one hash
    * aggregate. */
  private def q270(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir)("lineitem")
      .groupBy(floor(col("l_quantity") / 10).cast("int").as("qty_band"),
        floor(col("l_discount") * 100 / 2).cast("int").as("disc_band"))
      .agg(count(lit(1)).as("n"),
        (sum(revCents) / 100).cast("double").as("revenue0"))
      .select(col("qty_band"), col("disc_band"), col("n"),
        round(col("revenue0"), 2).as("revenue"))
      .orderBy("qty_band", "disc_band")
  }

  private def revCents =
    floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5)

  private val q270Sql =
    """SELECT CAST(floor(l_quantity / 10) AS INT) AS qty_band,
              CAST(floor(l_discount * 100 / 2) AS INT) AS disc_band,
              CAST(count(*) AS BIGINT) AS n,
              round(sum(floor(l_extendedprice * (1 - l_discount) * 100
                              + 0.5)) / 100, 2) AS revenue
       FROM lineitem
       GROUP BY 1, 2 ORDER BY 1, 2"""

  override def queries: Map[String, QueryFn] = Map(
    "q267_ab_assignment"  -> q267 _,
    "q268_snapshot_diff"  -> q268 _,
    "q269_weighted_median" -> q269 _,
    "q270_heatmap_bins"   -> q270 _)

  override def oracles: Map[String, String] = Map(
    "q267_ab_assignment"  -> q267Sql,
    "q268_snapshot_diff"  -> q268Sql,
    "q269_weighted_median" -> q269Sql,
    "q270_heatmap_bins"   -> q270Sql)
}
