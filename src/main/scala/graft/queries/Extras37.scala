package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 33: robust statistics and lead-lag analysis —
  * winsorized/trimmed means, cross-correlation at positive lags,
  * Pythagorean means.
  */
object Extras37 extends QueryPack {

  private def cents(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5)

  // --------------------------------------------------------------- q259
  /** Winsorized and trimmed means per priority: the p05/p95 fence
    * reduce broadcasts back; clamped values are integer cents or
    * interpolated halves, so the sums stay exact (order-independent)
    * in both engines. */
  private def q259(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
      .select(col("o_orderpriority").as("prio"),
        cents(col("o_totalprice")).as("c"))
    val fences = o.groupBy(col("prio").as("fp"))
      .agg(expr("percentile_cont(0.05) WITHIN GROUP (ORDER BY c)").as("lo"),
        expr("percentile_cont(0.95) WITHIN GROUP (ORDER BY c)").as("hi"))
    val inBand = col("c").between(col("lo"), col("hi"))
    o.join(broadcast(fences), col("prio") === col("fp"))
      .groupBy("prio")
      .agg(round(sum(least(greatest(col("c"), col("lo")), col("hi")))
          / count(lit(1)) / 100, 4).as("winsorized_mean"),
        round(sum(when(inBand, col("c")))
          / count(when(inBand, lit(1))) / 100, 4).as("trimmed_mean"),
        count(lit(1)).as("n"))
      .orderBy("prio")
  }

  private val q259Sql =
    """WITH c AS (
         SELECT o_orderpriority AS prio,
                floor(o_totalprice * 100 + 0.5) AS cents
         FROM orders),
       f AS (
         SELECT prio,
                percentile_cont(0.05) WITHIN GROUP (ORDER BY cents) AS lo,
                percentile_cont(0.95) WITHIN GROUP (ORDER BY cents) AS hi
         FROM c GROUP BY 1)
       SELECT c.prio,
              round(sum(least(greatest(c.cents, f.lo), f.hi))
                    / count(*) / 100, 4) AS winsorized_mean,
              round(sum(CASE WHEN c.cents BETWEEN f.lo AND f.hi
                        THEN c.cents END)
                    / count(CASE WHEN c.cents BETWEEN f.lo AND f.hi
                            THEN 1 END) / 100, 4) AS trimmed_mean,
              CAST(count(*) AS BIGINT) AS n
       FROM c JOIN f ON c.prio = f.prio
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q260
  /** Lead-lag cross-correlation: click volume today vs purchases k
    * days later (k = 0..3), over the daily reduce — does engagement
    * predict conversion, and at what delay? One window pass builds all
    * four shifted series; the unpivot stacks the per-lag aggregates. */
  private def q260(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val daily = e.groupBy(to_date(col("ts")).as("d"))
      .agg(sum(when(col("event_type") === "click", 1L).otherwise(0L))
        .as("clicks"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("purchases"))
    val w = Window.orderBy("d")
    val led = daily
      .withColumn("p0", col("purchases"))
      .withColumn("p1", lead(col("purchases"), 1).over(w))
      .withColumn("p2", lead(col("purchases"), 2).over(w))
      .withColumn("p3", lead(col("purchases"), 3).over(w))
    val agg = led.agg(
      round(corr(col("clicks"), col("p0")), 6).as("c0"),
      count(col("p0")).as("n0"),
      round(corr(col("clicks"), col("p1")), 6).as("c1"),
      count(col("p1")).as("n1"),
      round(corr(col("clicks"), col("p2")), 6).as("c2"),
      count(col("p2")).as("n2"),
      round(corr(col("clicks"), col("p3")), 6).as("c3"),
      count(col("p3")).as("n3"))
    agg.select(expr(
      "stack(4, 0, c0, n0, 1, c1, n1, 2, c2, n2, 3, c3, n3) " +
        "AS (lag, xcorr, n)"))
      .orderBy("lag")
  }

  private val q260Sql =
    """WITH daily AS (
         SELECT CAST(ts AS DATE) AS d,
                sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                  AS clicks,
                sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS purchases
         FROM events GROUP BY 1),
       led AS (
         SELECT clicks,
                lead(purchases, 0) OVER (ORDER BY d) AS p0,
                lead(purchases, 1) OVER (ORDER BY d) AS p1,
                lead(purchases, 2) OVER (ORDER BY d) AS p2,
                lead(purchases, 3) OVER (ORDER BY d) AS p3
         FROM daily)
       SELECT lag, xcorr, n FROM (
         SELECT 0 AS lag, round(corr(clicks, p0), 6) AS xcorr,
                CAST(count(p0) AS BIGINT) AS n FROM led
         UNION ALL
         SELECT 1, round(corr(clicks, p1), 6),
                CAST(count(p1) AS BIGINT) FROM led
         UNION ALL
         SELECT 2, round(corr(clicks, p2), 6),
                CAST(count(p2) AS BIGINT) FROM led
         UNION ALL
         SELECT 3, round(corr(clicks, p3), 6),
                CAST(count(p3) AS BIGINT) FROM led)
       ORDER BY lag"""

  // --------------------------------------------------------------- q261
  /** Pythagorean means of the unit price per brand: geometric
    * (exp-mean-ln), harmonic (count over reciprocal sum), arithmetic —
    * the classic geo <= arith sandwich as a data check, one broadcast
    * dim join + one reduce. */
  private def q261(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val unit = col("l_extendedprice") / col("l_quantity")
    t("lineitem")
      .join(broadcast(t("part")), col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand")
      .agg(round(exp(avg(log(unit))), 4).as("geo_mean"),
        round(count(lit(1)) / sum(col("l_quantity") / col("l_extendedprice")),
          4).as("harmonic_mean"),
        round(avg(unit), 4).as("arith_mean"))
      .orderBy("p_brand")
  }

  private val q261Sql =
    """SELECT p_brand,
              round(exp(avg(ln(l_extendedprice / l_quantity))), 4)
                AS geo_mean,
              round(count(*) / sum(l_quantity / l_extendedprice), 4)
                AS harmonic_mean,
              round(avg(l_extendedprice / l_quantity), 4) AS arith_mean
       FROM lineitem JOIN part ON p_partkey = l_partkey
       GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q259_winsorized"   -> q259 _,
    "q260_xcorr"        -> q260 _,
    "q261_pythagorean"  -> q261 _)

  override def oracles: Map[String, String] = Map(
    "q259_winsorized"   -> q259Sql,
    "q260_xcorr"        -> q260Sql,
    "q261_pythagorean"  -> q261Sql)
}
