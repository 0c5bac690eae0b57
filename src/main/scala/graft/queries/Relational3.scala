package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Relational coverage, part 3 (round 2) — ordered-set aggregates,
  * moment statistics, arg-max/min, histogram binning, grouping sets,
  * generator (explode/posexplode) surface, string/datetime/conditional
  * scalar-function families, array aggregation, and native pivot +
  * unpivot. All extensions beyond the reference's surface (SURVEY.md
  * §2.6/§2.7 "absent" rows), each with a DuckDB oracle.
  */
object Relational3 extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir)(name)

  // ---------------------------------------------------------------- q47
  /** Exact percentiles (ordered-set aggregate family, absent from the
    * reference — SURVEY.md §2.6). Spark's percentile() uses the same
    * linear interpolation as DuckDB's quantile_cont. ONE array-form
    * aggregate — four scalar percentile() calls would each keep their
    * own copy of every group's values (4× buffer + 4× sort; measured
    * 9 s vs ~1 s at sf0.1). */
  private def q47(s: SparkSession, dir: String): DataFrame =
    // Spread-guarded (guide §2.5): the exact-percentile partial
    // aggregate buffers every value in ONE task on a single-row-group
    // scan; project to the two needed columns first so the guard's
    // exchange (when it fires) moves 2 columns, not the row
    graft.operators.Spread.byKey(
        t(s, dir, "lineitem").select("l_returnflag", "l_extendedprice"),
        col("l_extendedprice")) // high-cardinality key → even 32-way spread
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.75D, 0.9D))")
        .as("ps"))
      .select(col("l_returnflag"),
        round(element_at(col("ps"), 1), 4).as("p25"),
        round(element_at(col("ps"), 2), 4).as("p50"),
        round(element_at(col("ps"), 3), 4).as("p75"),
        round(element_at(col("ps"), 4), 4).as("p90"))
      .orderBy(col("l_returnflag"))

  private val q47Sql =
    """SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.25), 4) AS p25,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.75), 4) AS p75,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------------------------------------------------------------- q48
  /** Moment statistics: corr / covariance / stddev / variance, sample
    * and population forms. Distributed one-pass central-moment merge on
    * both engines; rounding absorbs merge-order float noise. */
  private def q48(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_linestatus"))
      .agg(
        round(corr(col("l_quantity"), col("l_extendedprice")), 6).as("qty_price_corr"),
        round(covar_samp(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_covar"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 4).as("qty_price_covar_pop"),
        round(stddev_samp(col("l_extendedprice")), 4).as("price_stddev"),
        round(var_samp(col("l_extendedprice")), 2).as("price_var"),
        round(var_pop(col("l_extendedprice")), 2).as("price_var_pop"))
      .orderBy(col("l_linestatus"))

  private val q48Sql =
    """SELECT l_linestatus,
       round(corr(l_quantity, l_extendedprice), 6) AS qty_price_corr,
       round(covar_samp(l_quantity, l_extendedprice), 4) AS qty_price_covar,
       round(covar_pop(l_quantity, l_extendedprice), 4) AS qty_price_covar_pop,
       round(stddev_samp(l_extendedprice), 4) AS price_stddev,
       round(var_samp(l_extendedprice), 2) AS price_var,
       round(var_pop(l_extendedprice), 2) AS price_var_pop
       FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""

  // ---------------------------------------------------------------- q49
  /** arg-max / arg-min: richest and poorest customer per nation via
    * max_by/min_by over a struct ordering key — the struct's
    * (acctbal, custkey) lexicographic comparison makes ties
    * deterministic, which a bare max_by(name, acctbal) is not. */
  private def q49(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        max_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("top_customer"),
        round(max(col("c_acctbal")), 4).as("top_acctbal"),
        min_by(col("c_name"), struct(col("c_acctbal"), col("c_custkey"))).as("bottom_customer"),
        round(min(col("c_acctbal")), 4).as("bottom_acctbal"))
      .orderBy(col("c_nationkey"))

  private val q49Sql =
    """WITH ranked AS (
         SELECT c_nationkey, c_name, c_acctbal,
           ROW_NUMBER() OVER (PARTITION BY c_nationkey
             ORDER BY c_acctbal DESC, c_custkey DESC) AS rmax,
           ROW_NUMBER() OVER (PARTITION BY c_nationkey
             ORDER BY c_acctbal ASC, c_custkey ASC) AS rmin
         FROM customer)
       SELECT c_nationkey,
         max(CASE WHEN rmax = 1 THEN c_name END) AS top_customer,
         round(max(c_acctbal), 4) AS top_acctbal,
         max(CASE WHEN rmin = 1 THEN c_name END) AS bottom_customer,
         round(min(c_acctbal), 4) AS bottom_acctbal
       FROM ranked GROUP BY c_nationkey ORDER BY c_nationkey"""

  // ---------------------------------------------------------------- q50
  /** Fixed-width histogram as a single hash-aggregate pass (the
    * scale-safe shape: bucket key is computed per row, no global
    * min/max pre-pass, no sort). */
  private def q50(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(floor(col("o_totalprice") / 25000).cast("int").as("bucket"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 4).as("sum_price"),
           round(avg(col("o_totalprice")), 4).as("avg_price"))
      .orderBy(col("bucket"))

  private val q50Sql =
    """SELECT CAST(floor(o_totalprice / 25000) AS INT) AS bucket,
       count(*) AS n_orders,
       round(sum(o_totalprice), 4) AS sum_price,
       round(avg(o_totalprice), 4) AS avg_price
       FROM orders GROUP BY 1 ORDER BY bucket"""

  // ---------------------------------------------------------------- q51
  /** Explicit GROUPING SETS (beyond q20's rollup / q46's cube): two
    * independent one-dimension slices plus the grand total in ONE
    * aggregate — Spark expands to a single Expand+Aggregate, not three
    * scans. Uses the Spark 4 Dataset.groupingSets DSL. */
  private def q51(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupingSets(
        Seq(Seq(col("o_orderstatus")), Seq(col("o_orderpriority")), Seq()),
        col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
           round(sum(col("o_totalprice")), 4).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))
      .orderBy(col("status"), col("priority"))

  private val q51Sql =
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
       coalesce(o_orderpriority, 'ALL') AS priority,
       count(*) AS n_orders, round(sum(o_totalprice), 4) AS sum_price
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
       ORDER BY status, priority"""

  // ---------------------------------------------------------------- q52
  /** Generator / UDTF surface (SURVEY.md §2.8 "no UDTFs" row):
    * posexplode(sequence(...)) fans each order into one row per day of
    * a 4-day span — the lateral-view shape used for date spines. */
  private def q52(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(300)) === 0)
      .select(col("o_orderkey"),
        posexplode(expr(
          "sequence(o_orderdate, o_orderdate + interval 3 day, interval 1 day)")))
      .select(col("o_orderkey"), col("pos").cast("int").as("pos"),
              col("col").as("day"))
      .orderBy(col("o_orderkey"), col("pos"))

  private val q52Sql =
    """SELECT o_orderkey,
       CAST(datediff('day', o_orderdate, day) AS INT) AS pos, day
       FROM (SELECT o_orderkey, o_orderdate,
               unnest(generate_series(o_orderdate,
                 o_orderdate + INTERVAL 3 DAY, INTERVAL 1 DAY)) AS day
             FROM orders WHERE o_orderkey % 300 = 0)
       ORDER BY o_orderkey, pos"""

  // ---------------------------------------------------------------- q53
  /** String-function family (absent from the reference beyond case
    * mapping — SURVEY.md §2.7): length/substr/pad/concat/reverse/split
    * plus levenshtein edit distance, all codegen'd built-ins. */
  private def q53(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .filter(pmod(col("p_partkey"), lit(30)) === 0)
      .select(
        col("p_partkey"),
        length(col("p_name")).as("name_len"),
        upper(col("p_brand")).as("brand_upper"),
        substring(col("p_type"), 1, 5).as("type_head"),
        lpad(col("p_brand"), 12, "*").as("brand_padded"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        reverse(col("p_brand")).as("brand_rev"),
        levenshtein(col("p_brand"), col("p_type")).as("edit_dist"),
        size(split(col("p_name"), " ")).as("n_tokens"))
      .orderBy(col("p_partkey"))

  private val q53Sql =
    """SELECT p_partkey,
       CAST(length(p_name) AS INT) AS name_len,
       upper(p_brand) AS brand_upper,
       substring(p_type, 1, 5) AS type_head,
       lpad(p_brand, 12, '*') AS brand_padded,
       concat_ws('|', p_brand, p_type) AS brand_type,
       reverse(p_brand) AS brand_rev,
       CAST(levenshtein(p_brand, p_type) AS INT) AS edit_dist,
       CAST(len(string_split(p_name, ' ')) AS INT) AS n_tokens
       FROM part WHERE p_partkey % 30 = 0 ORDER BY p_partkey"""

  // ---------------------------------------------------------------- q54
  /** Datetime-function family beyond q10's date parts: truncation,
    * month arithmetic (add_months end-of-month clamp), last_day,
    * day-diff, epoch seconds. */
  private def q54(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .filter(pmod(col("o_orderkey"), lit(100)) === 0)
      .select(
        col("o_orderkey"),
        quarter(col("o_orderdate")).as("qtr"),
        weekofyear(col("o_orderdate")).as("iso_week"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        add_months(col("o_orderdate"), 1).as("next_month"),
        last_day(col("o_orderdate")).as("month_end"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_95"),
        unix_seconds(col("o_orderdate").cast("timestamp")).as("epoch_s"))
      .orderBy(col("o_orderkey"))

  private val q54Sql =
    """SELECT o_orderkey,
       CAST(quarter(o_orderdate) AS INT) AS qtr,
       CAST(weekofyear(o_orderdate) AS INT) AS iso_week,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(o_orderdate + INTERVAL 1 MONTH AS DATE) AS next_month,
       last_day(CAST(o_orderdate AS DATE)) AS month_end,
       CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS INT) AS days_since_95,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
       FROM orders WHERE o_orderkey % 100 = 0 ORDER BY o_orderkey"""

  // ---------------------------------------------------------------- q55
  /** Conditional-function family: nullif / coalesce / greatest / least
    * composed inside aggregates (one pass, codegen'd). */
  private def q55(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(nullif(col("l_discount"), lit(0.0)).isNull, 1).otherwise(0))
          .as("n_zero_discount"),
        round(sum(greatest(col("l_tax"), col("l_discount"))), 4).as("sum_max_rate"),
        round(sum(least(col("l_tax"), col("l_discount"))), 4).as("sum_min_rate"),
        round(sum(coalesce(nullif(col("l_tax"), lit(0.0)), lit(0.5))), 4)
          .as("sum_tax_defaulted"))
      .orderBy(col("l_returnflag"))

  private val q55Sql =
    """SELECT l_returnflag,
       CAST(sum(CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_zero_discount,
       round(sum(greatest(l_tax, l_discount)), 4) AS sum_max_rate,
       round(sum(least(l_tax, l_discount)), 4) AS sum_min_rate,
       round(sum(coalesce(nullif(l_tax, 0.0), 0.5)), 4) AS sum_tax_defaulted
       FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""

  // ---------------------------------------------------------------- q56
  /** Array aggregation: collect_set/collect_list → sort_array → slice,
    * serialized with concat_ws so the hash compare sees a stable scalar
    * (array column hashing is engine-dependent). */
  private def q56(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .groupBy(col("c_nationkey"))
      .agg(
        concat_ws(",", sort_array(collect_set(col("c_mktsegment")))).as("segments"),
        size(collect_set(col("c_mktsegment"))).as("n_segments"),
        concat_ws(",", slice(sort_array(collect_list(col("c_name"))), 1, 3))
          .as("first_names"))
      .orderBy(col("c_nationkey"))

  private val q56Sql =
    """SELECT c_nationkey,
       string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
       CAST(count(DISTINCT c_mktsegment) AS INT) AS n_segments,
       array_to_string(list_sort(list(c_name))[1:3], ',') AS first_names
       FROM customer GROUP BY c_nationkey ORDER BY c_nationkey"""

  // ---------------------------------------------------------------- q57
  /** Native DataFrame.pivot (explicit value list — no extra distinct
    * pass) immediately unpivoted back: exercises both reshape
    * directions; zero-fill makes the round trip total. */
  private def q57(s: SparkSession, dir: String): DataFrame = {
    val priorities = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val pivoted = t(s, dir, "orders")
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", priorities)
      .count()
      .na.fill(0L, priorities)
    pivoted
      .unpivot(Array(col("o_orderstatus")), priorities.map(col).toArray,
               "priority", "n_orders")
      .orderBy(col("o_orderstatus"), col("priority"))
  }

  private val q57Sql =
    """WITH st AS (SELECT DISTINCT o_orderstatus FROM orders),
       pri AS (SELECT unnest(['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW']) AS priority),
       cnt AS (SELECT o_orderstatus, o_orderpriority, count(*) AS n
               FROM orders GROUP BY 1, 2)
       SELECT st.o_orderstatus, pri.priority, coalesce(cnt.n, 0) AS n_orders
       FROM st CROSS JOIN pri
       LEFT JOIN cnt ON cnt.o_orderstatus = st.o_orderstatus
                    AND cnt.o_orderpriority = pri.priority
       ORDER BY st.o_orderstatus, pri.priority"""

  // ---------------------------------------------------------------- q63
  /** Per-group top-k via the typed bounded-heap Aggregator (TopK) —
    * q13's semantics without q13's window sort: partial buffers carry
    * at most k entries per group, so the shuffle moves k·partitions
    * rows instead of the whole table and nothing is fully sorted
    * (O(n log k), the at-scale shape for top-k). Same oracle SQL as
    * the window form — both must agree exactly. */
  private def q63(s: SparkSession, dir: String): DataFrame = {
    val topk = udaf(new graft.functions.TopK(3))
    t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(topk(col("o_totalprice"), col("o_orderkey")).as("top"))
      .select(col("o_custkey"), posexplode(col("top")))
      .select(col("o_custkey"), col("col._2").as("o_orderkey"),
              round(col("col._1"), 4).as("o_totalprice"),
              (col("pos") + 1).cast("int").as("rk"))
      .orderBy(col("o_custkey"), col("rk"))
  }

  private val q63Sql =
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 4) AS o_totalprice,
       CAST(rk AS INT) AS rk
       FROM (SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rk
             FROM orders)
       WHERE rk <= 3 ORDER BY o_custkey, rk"""

  // ---------------------------------------------------------------- q66
  /** Analytic window family beyond q13/q14's rank/lag: ntile,
    * percent_rank, cume_dist, nth_value/first/last over an explicit
    * full-partition frame. Total ordering (price, key) kills ties so
    * every function is engine-deterministic. */
  private def q66(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val sampled = t(s, dir, "orders").filter(pmod(col("o_orderkey"), lit(50)) === 0)
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    sampled.select(
        col("o_orderstatus"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cume"),
        first_value(col("o_orderkey")).over(full).as("cheapest_key"),
        last_value(col("o_orderkey")).over(full).as("priciest_key"),
        nth_value(col("o_orderkey"), 3).over(full).as("third_key"))
      .orderBy(col("o_orderstatus"), col("o_orderkey"))
  }

  private val q66Sql =
    """SELECT o_orderstatus, o_orderkey,
       CAST(ntile(4) OVER w AS INT) AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       first_value(o_orderkey) OVER wf AS cheapest_key,
       last_value(o_orderkey) OVER wf AS priciest_key,
       nth_value(o_orderkey, 3) OVER wf AS third_key
       FROM orders WHERE o_orderkey % 50 = 0
       WINDOW w AS (PARTITION BY o_orderstatus
                    ORDER BY o_totalprice, o_orderkey),
              wf AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
       ORDER BY o_orderstatus, o_orderkey"""

  // ---------------------------------------------------------------- q67
  /** Array higher-order functions (transform / filter / exists /
    * aggregate / zip_with) over per-order quantity arrays — the lambda
    * surface the vector ops build on, exercised as first-class API.
    * Arrays are sorted on build so contents are deterministic. */
  private def q67(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(100)) === 0)
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_list(col("l_quantity"))).as("qs"))
      .select(
        col("l_orderkey"),
        size(col("qs")).as("n_items"),
        round(aggregate(col("qs"), lit(0.0), (a, x) => a + x), 4).as("total_qty"),
        size(filter(col("qs"), x => x > 25)).as("n_big"),
        exists(col("qs"), x => x >= 49).as("any_big"),
        (element_at(col("qs"), 1) * 2).as("doubled_min"),
        round(aggregate(
          zip_with(col("qs"),
                   sequence(size(col("qs")), lit(1), lit(-1)).cast("array<double>"),
                   (x, w) => x * w),
          lit(0.0), (a, x) => a + x), 4).as("weighted"))
      .orderBy(col("l_orderkey"))

  private val q67Sql =
    """WITH arr AS (
         SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
         FROM lineitem WHERE l_orderkey % 100 = 0 GROUP BY 1)
       SELECT l_orderkey,
         CAST(len(qs) AS INT) AS n_items,
         round(list_sum(qs), 4) AS total_qty,
         CAST(len(list_filter(qs, x -> x > 25)) AS INT) AS n_big,
         (len(list_filter(qs, x -> x >= 49)) > 0) AS any_big,
         qs[1] * 2 AS doubled_min,
         round(list_sum(list_transform(generate_series(1, len(qs)),
           i -> qs[i] * (len(qs) - i + 1))), 4) AS weighted
       FROM arr ORDER BY l_orderkey"""

  // ---------------------------------------------------------------- q69
  /** rank() vs dense_rank() under REAL ties (quantities repeat heavily):
    * gap semantics vs dense numbering, same window. The window orders by
    * the tie-laden key only — ranks must agree across engines because
    * ties share a rank — while the OUTPUT ordering adds unique
    * tie-breakers so row order is total. */
  private def q69(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("l_returnflag")).orderBy(col("l_quantity"))
    t(s, dir, "lineitem")
      .filter(pmod(col("l_orderkey"), lit(500)) === 0)
      .select(col("l_returnflag"), col("l_orderkey"), col("l_linenumber"),
              col("l_quantity"),
              rank().over(w).as("rnk"),
              dense_rank().over(w).as("drnk"))
      .orderBy(col("l_returnflag"), col("l_quantity"), col("l_orderkey"),
               col("l_linenumber"), col("rnk"))
  }

  private val q69Sql =
    """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
       CAST(rank() OVER w AS INT) AS rnk,
       CAST(dense_rank() OVER w AS INT) AS drnk
       FROM lineitem WHERE l_orderkey % 500 = 0
       WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_quantity)
       ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber, rnk"""

  // ---------------------------------------------------------------- q71
  /** INTERSECT ALL — the one set operation q08/q15 left uncovered:
    * multiset intersection keeps each value min(countL, countR) times
    * (Spark plans a left-semi-style hash agg, no row explosion). */
  private def q71(s: SparkSession, dir: String): DataFrame = {
    val cn = t(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
    val sn = t(s, dir, "supplier").select(col("s_nationkey").as("nationkey"))
    cn.intersectAll(sn)
      .groupBy(col("nationkey")).agg(count(lit(1)).as("n_copies"))
      .orderBy(col("nationkey"))
  }

  private val q71Sql =
    """SELECT nationkey, count(*) AS n_copies
       FROM (SELECT c_nationkey AS nationkey FROM customer
             INTERSECT ALL
             SELECT s_nationkey FROM supplier)
       GROUP BY nationkey ORDER BY nationkey"""

  // ---------------------------------------------------------------- q72
  /** LIMIT/OFFSET pagination over a total order — offset() is the
    * Spark-side page cursor (driver still fetches only the page; the
    * sort is a TakeOrderedAndProject, not a full global sort). */
  private def q72(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select(col("o_orderkey"), round(col("o_totalprice"), 4).as("o_totalprice"))
      .offset(40)
      .limit(20)

  private val q72Sql =
    """SELECT o_orderkey, round(o_totalprice, 4) AS o_totalprice
       FROM orders ORDER BY o_totalprice DESC, o_orderkey
       LIMIT 20 OFFSET 40"""

  override val queries: Map[String, QueryFn] = Map(
    "q47_percentiles"     -> q47 _,
    "q48_stats_moments"   -> q48 _,
    "q49_argmax"          -> q49 _,
    "q50_histogram"       -> q50 _,
    "q51_grouping_sets"   -> q51 _,
    "q52_explode_days"    -> q52 _,
    "q53_string_funcs"    -> q53 _,
    "q54_datetime_funcs"  -> q54 _,
    "q55_conditional"     -> q55 _,
    "q56_array_agg"       -> q56 _,
    "q57_pivot_unpivot"   -> q57 _,
    "q63_topk_heap"       -> q63 _,
    "q66_window_analytics"-> q66 _,
    "q67_array_hof"       -> q67 _,
    "q69_rank_dense"      -> q69 _,
    "q71_intersect_all"   -> q71 _,
    "q72_pagination"      -> q72 _)

  override val oracles: Map[String, String] = Map(
    "q47_percentiles"     -> q47Sql,
    "q48_stats_moments"   -> q48Sql,
    "q49_argmax"          -> q49Sql,
    "q50_histogram"       -> q50Sql,
    "q51_grouping_sets"   -> q51Sql,
    "q52_explode_days"    -> q52Sql,
    "q53_string_funcs"    -> q53Sql,
    "q54_datetime_funcs"  -> q54Sql,
    "q55_conditional"     -> q55Sql,
    "q56_array_agg"       -> q56Sql,
    "q57_pivot_unpivot"   -> q57Sql,
    "q63_topk_heap"       -> q63Sql,
    "q66_window_analytics"-> q66Sql,
    "q67_array_hof"       -> q67Sql,
    "q69_rank_dense"      -> q69Sql,
    "q71_intersect_all"   -> q71Sql,
    "q72_pagination"      -> q72Sql)
}
