package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 28: the remaining TPC-H query shapes, adapted
  * to the testdata schema (no partsupp table; no ship-mode / commit /
  * receipt columns — lateness is datediff(ship, order) against fixed
  * thresholds, supply cost is a retail-price fraction).
  *
  * Money math follows the exact-integer-cents rule (see q204): every
  * summed currency expression goes through floor(x*100 + 0.5) so the
  * accumulation is order-independent and engine-agnostic; ratios divide
  * two such exact sums, so both engines divide identical doubles.
  */
object Extras32 extends QueryPack {

  /** floor(expr*100 + 0.5): the summation-order-proof cents map. */
  private def cents(c: Column): Column = floor(c * 100 + 0.5)

  private def revCents: Column =
    cents(col("l_extendedprice") * (lit(1) - col("l_discount")))

  // --------------------------------------------------------------- q227
  /** TPC-H Q4 (order priority checking): orders in a half-year window
    * with at least one line shipped >90 days after the order date,
    * counted per priority. The EXISTS is a left-semi join whose extra
    * non-equi condition rides on the equi key — one shuffle pair, no
    * fan-out from multi-line orders. */
  private def q227(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val o = t("orders").filter(
      to_date(col("o_orderdate")).between("1996-01-01", "1996-06-30"))
    o.join(t("lineitem"),
        col("l_orderkey") === col("o_orderkey") &&
          datediff(col("l_shipdate"), col("o_orderdate")) > 90,
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  private val q227Sql =
    """SELECT o_orderpriority, count(*) AS order_count
       FROM orders
       WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
         AND CAST(o_orderdate AS DATE) < DATE '1996-07-01'
         AND EXISTS (SELECT 1 FROM lineitem
                     WHERE l_orderkey = o_orderkey
                       AND datediff('day', o_orderdate, l_shipdate) > 90)
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q228
  /** TPC-H Q6 (forecast revenue change): pure scan-side filter + one
    * ungrouped aggregate — every predicate pushes to the parquet scan,
    * nothing shuffles but the single partial-agg row per task. */
  private def q228(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir)("lineitem")
      .filter(year(col("l_shipdate")) === 1996 &&
        col("l_discount").between(0.03, 0.07) && col("l_quantity") < 24)
      .agg((sum(cents(col("l_extendedprice") * col("l_discount"))) / 100)
             .as("revenue"),
           count(lit(1)).as("n_lines"))
  }

  private val q228Sql =
    """SELECT sum(floor(l_extendedprice * l_discount * 100 + 0.5)) / 100
                AS revenue,
              count(*) AS n_lines
       FROM lineitem
       WHERE year(l_shipdate) = 1996
         AND l_discount BETWEEN 0.03 AND 0.07
         AND l_quantity < 24"""

  // --------------------------------------------------------------- q229
  /** TPC-H Q8 (national market share): of the ECONOMY-part revenue sold
    * into ASIA-region customers, the share supplied by nations 0-4, per
    * year. Region/nation/supplier dims broadcast; the two fact joins
    * (orders, customer) reuse their natural keys. Numerator and
    * denominator are exact-cents sums, so the share divides identical
    * doubles in both engines. */
  private def q229(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val asiaNations = t("nation")
      .join(broadcast(t("region").filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey")
    t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t("part").filter(col("p_type") === "ECONOMY")),
        col("l_partkey") === col("p_partkey"))
      .withColumn("cents", revCents)
      .groupBy(year(col("o_orderdate")).as("yr"))
      .agg(round(coalesce(sum(when(col("s_nationkey") < 5, col("cents"))),
                          lit(0)) / sum(col("cents")), 6).as("mkt_share"))
      .orderBy("yr")
  }

  private val q229Sql =
    """WITH sales AS (
         SELECT year(o_orderdate) AS yr, s_nationkey,
                floor(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                  AS cents
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN part     ON l_partkey = p_partkey
         WHERE r_name = 'ASIA' AND p_type = 'ECONOMY')
       SELECT yr,
              round(coalesce(sum(CASE WHEN s_nationkey < 5 THEN cents END),
                             0) / sum(cents), 6) AS mkt_share
       FROM sales GROUP BY yr ORDER BY yr"""

  // --------------------------------------------------------------- q230
  /** TPC-H Q9 (product type profit): profit per supplier nation and
    * year over widget-family parts, with supply cost modeled as 60% of
    * retail price (no partsupp table). The part filter prunes before
    * the join; profit rounds through exact cents per line, so the sum
    * is order-independent even with negative-margin lines. */
  private def q230(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t("lineitem")
      .join(broadcast(t("part").filter(col("p_name").like("%widget%"))),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(t("supplier")), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
      .join(t("orders"), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("yr"))
      .agg((sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))
          - lit(0.6) * col("p_retailprice") * col("l_quantity"))) / 100)
        .as("profit"))
      .orderBy(col("nation"), col("yr").desc)
  }

  private val q230Sql =
    """SELECT n_name AS nation, year(o_orderdate) AS yr,
              sum(floor((l_extendedprice * (1 - l_discount)
                         - 0.6 * p_retailprice * l_quantity) * 100 + 0.5))
                / 100 AS profit
       FROM lineitem
       JOIN part     ON l_partkey = p_partkey
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation   ON s_nationkey = n_nationkey
       JOIN orders   ON o_orderkey = l_orderkey
       WHERE p_name LIKE '%widget%'
       GROUP BY 1, 2 ORDER BY 1, 2 DESC"""

  // --------------------------------------------------------------- q231
  /** TPC-H Q13 (customer distribution): orders-per-customer histogram
    * INCLUDING zero-order customers — the left-outer join with the
    * priority exclusion in the JOIN condition (not WHERE, which would
    * turn it inner). Two reduces: customer grain, then count grain. */
  private def q231(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t("customer")
      .join(t("orders"),
        col("c_custkey") === col("o_custkey") &&
          col("o_orderpriority") =!= "1-URGENT",
        "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(desc("custdist"), desc("c_count"))
  }

  private val q231Sql =
    """WITH per_cust AS (
         SELECT c_custkey, count(o_orderkey) AS c_count
         FROM customer
         LEFT JOIN orders ON c_custkey = o_custkey
                         AND o_orderpriority <> '1-URGENT'
         GROUP BY 1)
       SELECT c_count, count(*) AS custdist
       FROM per_cust GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""

  // --------------------------------------------------------------- q232
  /** TPC-H Q14 (promo effect): percent of one month's revenue from
    * PROMO-type parts. One broadcast dim join, one ungrouped agg; both
    * ratio legs are exact-cents sums. */
  private def q232(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t("lineitem")
      .filter(to_date(col("l_shipdate")).between("1996-09-01", "1996-09-30"))
      .join(broadcast(t("part")), col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0)
          * sum(when(col("p_type") === "PROMO", revCents).otherwise(0))
          / sum(revCents), 6).as("promo_share"))
  }

  private val q232Sql =
    """SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                    THEN floor(l_extendedprice * (1 - l_discount) * 100
                               + 0.5)
                    ELSE 0 END)
                  / sum(floor(l_extendedprice * (1 - l_discount) * 100
                              + 0.5)), 6) AS promo_share
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE CAST(l_shipdate AS DATE) >= DATE '1996-09-01'
         AND CAST(l_shipdate AS DATE) < DATE '1996-10-01'"""

  // --------------------------------------------------------------- q233
  /** TPC-H Q15 (top supplier): quarterly revenue per supplier, keep the
    * max. The scalar-subquery max broadcasts a 1-row aggregate back
    * against the already-reduced revenue table — no window over the
    * full set, no second scan of lineitem. Double equality is safe
    * because both sides derive from the same exact-cents sums. */
  private def q233(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val revenue = t("lineitem")
      .filter(to_date(col("l_shipdate")).between("1996-01-01", "1996-03-31"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg((sum(revCents) / 100).as("total_revenue"))
    val mx = revenue.agg(max(col("total_revenue")).as("mx"))
    revenue
      .join(broadcast(mx), col("total_revenue") === col("mx"))
      .join(broadcast(Tables(s, dir)("supplier")),
        col("s_suppkey") === col("supplier_no"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  private val q233Sql =
    """WITH revenue AS (
         SELECT l_suppkey AS supplier_no,
                sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5))
                  / 100 AS total_revenue
         FROM lineitem
         WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
         GROUP BY 1)
       SELECT s_suppkey, s_name, total_revenue
       FROM supplier JOIN revenue ON s_suppkey = supplier_no
       WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
       ORDER BY s_suppkey"""

  // --------------------------------------------------------------- q234
  /** TPC-H Q17 (small-quantity-order revenue): yearly revenue that
    * would vanish if sub-20%-of-average-quantity orders stopped. The
    * correlated scalar avg decorrelates to a per-part reduce joined
    * back on the part key the lineitem side already carries. The
    * threshold (0.2 * avg of integral quantities) is double-exact. */
  private def q234(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val thr = t("lineitem").groupBy(col("l_partkey").as("t_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("qty_thr"))
    t("lineitem")
      .join(broadcast(t("part").filter(col("p_brand") === "Brand#23")),
        col("l_partkey") === col("p_partkey"))
      .join(thr, col("l_partkey") === col("t_partkey"))
      .filter(col("l_quantity") < col("qty_thr"))
      .agg((sum(cents(col("l_extendedprice"))) / 700).as("avg_yearly"))
  }

  private val q234Sql =
    """SELECT sum(floor(l_extendedprice * 100 + 0.5)) / 700 AS avg_yearly
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE p_brand = 'Brand#23'
         AND l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                           FROM lineitem l2
                           WHERE l2.l_partkey = p_partkey)"""

  // --------------------------------------------------------------- q235
  /** TPC-H Q19 (discounted revenue): three disjunctive brand/size/
    * quantity branches OR-ed into one predicate — the classic test that
    * a disjunction over join-plus-scan columns still prunes (the shared
    * part-key equi-join stays a single hash join; the OR evaluates
    * post-join inside codegen, not as three unions). */
  private def q235(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    def branch(brand: String, sizeHi: Int, qLo: Int, qHi: Int): Column =
      col("p_brand") === brand && col("p_size").between(1, sizeHi) &&
        col("l_quantity").between(qLo, qHi)
    t("lineitem")
      .join(broadcast(t("part")), col("p_partkey") === col("l_partkey"))
      .filter(branch("Brand#12", 15, 1, 11) ||
        branch("Brand#23", 25, 10, 20) || branch("Brand#34", 35, 20, 30))
      .agg((sum(revCents) / 100).as("revenue"),
        count(lit(1)).as("n_matched"))
  }

  private val q235Sql =
    """SELECT sum(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5))
                / 100 AS revenue,
              count(*) AS n_matched
       FROM lineitem JOIN part ON p_partkey = l_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 1 AND 11)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
              AND l_quantity BETWEEN 10 AND 20)
          OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
              AND l_quantity BETWEEN 20 AND 30)"""

  // --------------------------------------------------------------- q236
  /** TPC-H Q21 (suppliers who kept orders waiting): late lines of
    * finalized orders where the order had other suppliers but THIS was
    * the only late one. The EXISTS / NOT-EXISTS pair decorrelates to
    * two order-grain reduces (distinct suppliers, distinct LATE
    * suppliers) joined back on the order key — three shuffles total,
    * all on l_orderkey, so AQE coalesces them onto one layout. */
  private def q236(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val late = t("lineitem")
      .join(t("orders").filter(col("o_orderstatus") === "F"),
        col("o_orderkey") === col("l_orderkey"))
      .filter(datediff(col("l_shipdate"), col("o_orderdate")) > 90)
      .select("l_orderkey", "l_suppkey")
    val nSupp = t("lineitem").groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
    val nLate = late.groupBy("l_orderkey")
      .agg(countDistinct(col("l_suppkey")).as("n_late"))
    late
      .join(nSupp, "l_orderkey").filter(col("n_supp") >= 2)
      .join(nLate, "l_orderkey").filter(col("n_late") === 1)
      .join(broadcast(t("supplier")), col("s_suppkey") === col("l_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(desc("numwait"), col("s_name"))
  }

  private val q236Sql =
    """WITH late AS (
         SELECT l_orderkey, l_suppkey
         FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         WHERE o_orderstatus = 'F'
           AND datediff('day', o_orderdate, l_shipdate) > 90),
       nsupp AS (
         SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp
         FROM lineitem GROUP BY 1),
       nlate AS (
         SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_late
         FROM late GROUP BY 1)
       SELECT s_name, count(*) AS numwait
       FROM late
       JOIN nsupp USING (l_orderkey)
       JOIN nlate USING (l_orderkey)
       JOIN supplier ON s_suppkey = l_suppkey
       WHERE n_supp >= 2 AND n_late = 1
       GROUP BY 1 ORDER BY numwait DESC, s_name"""

  // --------------------------------------------------------------- q237
  /** TPC-H Q22 (global sales opportunity): rich-but-dormant customers —
    * account balance above the positive-balance average, no orders in
    * the final year, grouped by nation code. The average threshold is
    * computed in exact cents (sum of integers / count) so the
    * comparison never straddles a summation-order ulp; the dormancy
    * check is a left-anti join against the recent-orders keys. */
  private def q237(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val avgPos = t("customer").filter(col("c_acctbal") > 0)
      .agg((sum(cents(col("c_acctbal"))) / count(lit(1))).as("avg_cents"))
    val recent = t("orders")
      .filter(to_date(col("o_orderdate")) >= "2001-01-01")
      .select("o_custkey")
    t("customer")
      .filter(col("c_nationkey") < 10)
      .join(broadcast(avgPos))
      .filter(cents(col("c_acctbal")) > col("avg_cents"))
      .join(recent, col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        (sum(cents(col("c_acctbal"))) / 100).as("totacctbal"))
      .orderBy("cntrycode")
  }

  private val q237Sql =
    """WITH pos AS (
         SELECT sum(floor(c_acctbal * 100 + 0.5)) / count(*) AS avg_cents
         FROM customer WHERE c_acctbal > 0)
       SELECT c_nationkey AS cntrycode, count(*) AS numcust,
              sum(floor(c_acctbal * 100 + 0.5)) / 100 AS totacctbal
       FROM customer
       WHERE floor(c_acctbal * 100 + 0.5) > (SELECT avg_cents FROM pos)
         AND c_nationkey < 10
         AND NOT EXISTS (SELECT 1 FROM orders
                         WHERE o_custkey = c_custkey
                           AND CAST(o_orderdate AS DATE)
                               >= DATE '2001-01-01')
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q238
  /** TPC-H Q12 shape (shipping-mode priority counts, ship-mode column
    * replaced by lateness bands): urgent vs non-urgent line counts per
    * on-time / late / very-late band for one ship year. */
  private def q238(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val gap = datediff(col("l_shipdate"), col("o_orderdate"))
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    t("lineitem").filter(year(col("l_shipdate")) === 1996)
      .join(t("orders"), col("o_orderkey") === col("l_orderkey"))
      .withColumn("ship_band",
        when(gap > 180, "very_late").when(gap > 90, "late")
          .otherwise("on_time"))
      .groupBy("ship_band")
      .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(!hi, 1L).otherwise(0L)).as("low_line_count"))
      .orderBy("ship_band")
  }

  private val q238Sql =
    """WITH classed AS (
         SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate) > 180
                       THEN 'very_late'
                     WHEN datediff('day', o_orderdate, l_shipdate) > 90
                       THEN 'late'
                     ELSE 'on_time' END AS ship_band,
                o_orderpriority
         FROM lineitem JOIN orders ON o_orderkey = l_orderkey
         WHERE year(l_shipdate) = 1996)
       SELECT ship_band,
              CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
              CAST(sum(CASE WHEN o_orderpriority
                              NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
       FROM classed GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q239
  /** TPC-H Q2 shape (minimum-cost supplier, partsupp replaced by the
    * observed offer book): per mid-size part, the supplier(s) matching
    * the part's minimum observed unit price, with supplier-nation
    * enrichment. The correlated min decorrelates to a second reduce of
    * the SAME offer aggregate (no lineitem re-scan), joined back on the
    * part key; min over doubles is order-independent, so the double
    * equality join is engine-stable. */
  private def q239(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val offer = t("lineitem")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("unit_price"))
    val best = offer.groupBy(col("l_partkey").as("b_partkey"))
      .agg(min(col("unit_price")).as("best"))
    t("part").filter(col("p_size").between(10, 20))
      .join(offer, col("p_partkey") === col("l_partkey"))
      .join(best,
        col("b_partkey") === col("p_partkey") &&
          col("unit_price") === col("best"))
      .join(broadcast(t("supplier")), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(t("nation")), col("s_nationkey") === col("n_nationkey"))
      .select(col("p_partkey"), col("p_name"), col("s_suppkey"),
        col("s_name"), col("n_name"),
        // floor-truncate, not round: a unit price landing exactly on a
        // .00005 boundary diverges between Spark's BigDecimal HALF_UP
        // and DuckDB's multiply-and-rint (seen at sf0.001); floor of
        // the same double is bit-identical everywhere
        (floor(col("unit_price") * 10000.0) / 10000.0).as("best_price"))
      .orderBy("p_partkey", "s_suppkey")
      .limit(100)
  }

  private val q239Sql =
    """WITH offer AS (
         SELECT l_partkey, l_suppkey,
                min(l_extendedprice / l_quantity) AS unit_price
         FROM lineitem GROUP BY 1, 2)
       SELECT p_partkey, p_name, s_suppkey, s_name, n_name,
              floor(unit_price * 10000.0) / 10000.0 AS best_price
       FROM part
       JOIN offer    ON p_partkey = l_partkey
       JOIN supplier ON s_suppkey = l_suppkey
       JOIN nation   ON s_nationkey = n_nationkey
       WHERE p_size BETWEEN 10 AND 20
         AND unit_price = (SELECT min(o2.unit_price) FROM offer o2
                           WHERE o2.l_partkey = p_partkey)
       ORDER BY p_partkey, s_suppkey LIMIT 100"""

  // --------------------------------------------------------------- q240
  /** TPC-H Q20 shape (part promotion candidates, partsupp availability
    * replaced by shipped volume): suppliers who moved >300 units of
    * bolt-family parts across two ship years — a grouped HAVING
    * subquery consumed as a left-semi join against the supplier dim. */
  private def q240(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val heavy = t("lineitem")
      .filter(to_date(col("l_shipdate")).between("1996-01-01", "1997-12-31"))
      .join(broadcast(t("part").filter(col("p_name").like("%bolt%"))),
        col("p_partkey") === col("l_partkey"))
      .groupBy("l_suppkey")
      .agg(sum(col("l_quantity")).as("qty"))
      .filter(col("qty") > 300)
    t("supplier")
      .join(heavy, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  private val q240Sql =
    """SELECT s_suppkey, s_name
       FROM supplier
       WHERE s_suppkey IN (
         SELECT l_suppkey
         FROM lineitem JOIN part ON p_partkey = l_partkey
         WHERE p_name LIKE '%bolt%'
           AND CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
           AND CAST(l_shipdate AS DATE) < DATE '1998-01-01'
         GROUP BY 1 HAVING sum(l_quantity) > 300)
       ORDER BY s_suppkey"""

  override def queries: Map[String, QueryFn] = Map(
    "q227_tpch_q4"  -> q227 _,
    "q228_tpch_q6"  -> q228 _,
    "q229_tpch_q8"  -> q229 _,
    "q230_tpch_q9"  -> q230 _,
    "q231_tpch_q13" -> q231 _,
    "q232_tpch_q14" -> q232 _,
    "q233_tpch_q15" -> q233 _,
    "q234_tpch_q17" -> q234 _,
    "q235_tpch_q19" -> q235 _,
    "q236_tpch_q21" -> q236 _,
    "q237_tpch_q22" -> q237 _,
    "q238_tpch_q12" -> q238 _,
    "q239_tpch_q2"  -> q239 _,
    "q240_tpch_q20" -> q240 _)

  override def oracles: Map[String, String] = Map(
    "q227_tpch_q4"  -> q227Sql,
    "q228_tpch_q6"  -> q228Sql,
    "q229_tpch_q8"  -> q229Sql,
    "q230_tpch_q9"  -> q230Sql,
    "q231_tpch_q13" -> q231Sql,
    "q232_tpch_q14" -> q232Sql,
    "q233_tpch_q15" -> q233Sql,
    "q234_tpch_q17" -> q234Sql,
    "q235_tpch_q19" -> q235Sql,
    "q236_tpch_q21" -> q236Sql,
    "q237_tpch_q22" -> q237Sql,
    "q238_tpch_q12" -> q238Sql,
    "q239_tpch_q2"  -> q239Sql,
    "q240_tpch_q20" -> q240Sql)
}
