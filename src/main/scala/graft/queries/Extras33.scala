package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 29: experimentation + data-quality analytics —
  * Welch's t, readability proxies, fuzzy name matching, compounded
  * growth, retention curves, price elasticity, near-duplicate invoice
  * detection, IQR outlier fences, calendar-gap detection.
  */
object Extras33 extends QueryPack {

  private def cents(c: org.apache.spark.sql.Column) = floor(c * 100 + 0.5)

  // --------------------------------------------------------------- q241
  /** Welch's t statistic of each event type's value against the 'view'
    * baseline — the A/B-test readout. One pass computes every group's
    * (n, mean, variance); the single baseline row broadcasts back, so
    * the raw events shuffle exactly once. */
  private def q241(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val stats = e.groupBy("event_type")
      .agg(count(lit(1)).as("n"), avg(col("value")).as("m"),
        var_samp(col("value")).as("v"))
    val base = stats.filter(col("event_type") === "view")
      .select(col("n").as("n0"), col("m").as("m0"), col("v").as("v0"))
    stats.filter(col("event_type") =!= "view")
      .crossJoin(broadcast(base))
      .select(col("event_type"), col("n"),
        round(col("m") - col("m0"), 4).as("mean_diff"),
        round((col("m") - col("m0"))
          / sqrt(col("v") / col("n") + col("v0") / col("n0")), 4)
          .as("t_stat"))
      .orderBy("event_type")
  }

  private val q241Sql =
    """WITH stats AS (
         SELECT event_type, count(*) AS n, avg(value) AS m,
                var_samp(value) AS v
         FROM events GROUP BY 1),
       base AS (SELECT n AS n0, m AS m0, v AS v0 FROM stats
                WHERE event_type = 'view')
       SELECT s.event_type, s.n,
              round(s.m - b.m0, 4) AS mean_diff,
              round((s.m - b.m0) / sqrt(s.v / s.n + b.v0 / b.n0), 4)
                AS t_stat
       FROM stats s CROSS JOIN base b
       WHERE s.event_type <> 'view'
       ORDER BY s.event_type"""

  // --------------------------------------------------------------- q242
  /** Gunning-Fog-style readability proxy per source: vowel-group
    * "syllables" per word and the share of >=3-syllable words. The
    * tokenizer and syllable regex are shared verbatim with the oracle;
    * everything reduces at (source) after map-side per-doc counts. */
  private def q242(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val per = d.select(col("source"),
      expr("size(filter(split(lower(text), '[^a-z]+'), " +
        "w -> length(w) > 0))").as("n_words"),
      expr("size(regexp_extract_all(lower(text), '[aeiou]+', 0))")
        .as("n_syll"),
      expr("size(filter(transform(filter(split(lower(text), '[^a-z]+'), " +
        "w -> length(w) > 0), " +
        "w -> size(regexp_extract_all(w, '[aeiou]+', 0))), k -> k >= 3))")
        .as("n_complex"))
    per.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        round(sum("n_syll") / sum("n_words").cast("double"), 6)
          .as("syll_per_word"),
        round(sum("n_complex") / sum("n_words").cast("double"), 6)
          .as("complex_share"))
      .orderBy("source")
  }

  private val q242Sql =
    """WITH per AS (
         SELECT source,
                len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                    w -> len(w) > 0)) AS n_words,
                len(regexp_extract_all(lower(text), '[aeiou]+')) AS n_syll,
                len(list_filter(
                    list_transform(
                      list_filter(string_split_regex(lower(text),
                                                     '[^a-z]+'),
                                  w -> len(w) > 0),
                      w -> len(regexp_extract_all(w, '[aeiou]+'))),
                    k -> k >= 3)) AS n_complex
         FROM documents)
       SELECT source, count(*) AS n_docs,
              round(sum(n_syll) / sum(n_words)::DOUBLE, 6) AS syll_per_word,
              round(sum(n_complex) / sum(n_words)::DOUBLE, 6)
                AS complex_share
       FROM per GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q243
  /** Near-identical part names: levenshtein <= 2 over the DISTINCT name
    * set — entity-resolution's blocking-free small-domain case. The
    * distinct reduce shrinks the quadratic comparison to the name
    * domain (a few hundred strings), broadcast on one side, so the
    * "self-join" never touches the full part table twice. */
  private def q243(s: SparkSession, dir: String): DataFrame = {
    val names = Tables(s, dir)("part").select("p_name").distinct()
    val a = names.select(col("p_name").as("name_a"))
    val b = names.select(col("p_name").as("name_b"))
    a.join(broadcast(b), col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist") <= 2)
      .orderBy("dist", "name_a", "name_b")
      .limit(100)
  }

  private val q243Sql =
    """WITH names AS (SELECT DISTINCT p_name FROM part)
       SELECT a.p_name AS name_a, b.p_name AS name_b,
              levenshtein(a.p_name, b.p_name) AS dist
       FROM names a JOIN names b ON a.p_name < b.p_name
       WHERE levenshtein(a.p_name, b.p_name) <= 2
       ORDER BY dist, name_a, name_b LIMIT 100"""

  // --------------------------------------------------------------- q244
  /** Compounded month-over-month revenue growth per year via the
    * exp-sum-ln product aggregate — the multiplicative fold SQL lacks a
    * native aggregate for. Month totals are exact cents, so both
    * engines feed ln() identical doubles. */
  private def q244(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val monthly = o.groupBy(year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"))
      .agg(sum(cents(col("o_totalprice"))).as("cents"))
    val w = Window.partitionBy("yr").orderBy("mo")
    monthly.withColumn("prev", lag(col("cents"), 1).over(w))
      .filter(col("prev").isNotNull)
      .groupBy("yr")
      .agg(count(lit(1)).as("n_months"),
        round(exp(sum(log(col("cents") / col("prev")))) - 1, 6)
          .as("compound_growth"))
      .orderBy("yr")
  }

  private val q244Sql =
    """WITH monthly AS (
         SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
                sum(floor(o_totalprice * 100 + 0.5)) AS cents
         FROM orders GROUP BY 1, 2),
       ratios AS (
         SELECT yr, mo, cents,
                lag(cents) OVER (PARTITION BY yr ORDER BY mo) AS prev
         FROM monthly)
       SELECT yr, count(*) AS n_months,
              round(exp(sum(ln(cents / prev))) - 1, 6) AS compound_growth
       FROM ratios WHERE prev IS NOT NULL
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q245
  /** Cohort-free retention curve: share of ALL users active k weeks
    * after their first-seen week. Week alignment comes from
    * date_trunc('week'), so the offset is an exact day-count / 7; the
    * distinct (user, k) reduce and the first-seen reduce share the
    * user-key shuffle. */
  private def q245(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val firstw = e.groupBy("user_id")
      .agg(min(date_trunc("week", col("ts"))).as("w0"))
    val active = e.join(firstw, "user_id")
      .select(col("user_id"),
        (datediff(date_trunc("week", col("ts")), col("w0")) / 7)
          .cast("long").as("k"))
      .distinct()
    val total = firstw.agg(count(lit(1)).as("n_users"))
    active.crossJoin(broadcast(total))
      .groupBy("k", "n_users")
      .agg(count(lit(1)).as("n_active"),
        round(count(lit(1)) / col("n_users").cast("double"), 6)
          .as("retention"))
      .select("k", "n_active", "retention")
      .orderBy("k")
      .limit(20)
  }

  private val q245Sql =
    """WITH firstw AS (
         SELECT user_id, min(date_trunc('week', ts)) AS w0
         FROM events GROUP BY 1),
       active AS (
         SELECT DISTINCT e.user_id,
                datediff('week', f.w0, date_trunc('week', e.ts)) AS k
         FROM events e JOIN firstw f ON e.user_id = f.user_id),
       total AS (SELECT count(*) AS n_users FROM firstw)
       SELECT k, count(*) AS n_active,
              round(count(*) / n_users::DOUBLE, 6) AS retention
       FROM active CROSS JOIN total
       GROUP BY k, n_users ORDER BY k LIMIT 20"""

  // --------------------------------------------------------------- q246
  /** Log-log price elasticity of demand per brand: regr_slope of
    * ln(quantity) on ln(unit price) — the econometric read on the
    * lineitem fact, one broadcast dim join + one reduce. */
  private def q246(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    t("lineitem")
      .join(broadcast(t("part")), col("p_partkey") === col("l_partkey"))
      .groupBy("p_brand")
      .agg(round(regr_slope(log(col("l_quantity")),
          log(col("l_extendedprice") / col("l_quantity"))), 4)
          .as("elasticity"),
        count(lit(1)).as("n_lines"))
      .orderBy("p_brand")
  }

  private val q246Sql =
    """SELECT p_brand,
              round(regr_slope(ln(l_quantity),
                               ln(l_extendedprice / l_quantity)), 4)
                AS elasticity,
              count(*) AS n_lines
       FROM lineitem JOIN part ON p_partkey = l_partkey
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q247
  /** Near-duplicate invoice detection: same customer, totals within
    * $5000, order dates within 60 days — the fraud/dedup audit shape.
    * The self-join hashes on the customer key; the price/date bands
    * evaluate post-join inside codegen. */
  private def q247(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val a = o.select(col("o_custkey").as("custkey"),
      col("o_orderkey").as("order_a"), col("o_totalprice").as("price_a"),
      col("o_orderdate").as("date_a"))
    val b = o.select(col("o_custkey").as("custkey_b"),
      col("o_orderkey").as("order_b"), col("o_totalprice").as("price_b"),
      col("o_orderdate").as("date_b"))
    a.join(b, col("custkey") === col("custkey_b") &&
        col("order_a") < col("order_b"))
      .filter(abs(cents(col("price_a")) - cents(col("price_b"))) <= 500000 &&
        abs(datediff(col("date_b"), col("date_a"))) <= 60)
      .select(col("custkey"), col("order_a"), col("order_b"),
        datediff(col("date_b"), col("date_a")).as("gap_days"))
      .orderBy("custkey", "order_a", "order_b")
      .limit(200)
  }

  private val q247Sql =
    """SELECT a.o_custkey AS custkey, a.o_orderkey AS order_a,
              b.o_orderkey AS order_b,
              datediff('day', a.o_orderdate, b.o_orderdate) AS gap_days
       FROM orders a JOIN orders b
         ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey
       WHERE abs(floor(a.o_totalprice * 100 + 0.5)
                 - floor(b.o_totalprice * 100 + 0.5)) <= 500000
         AND abs(datediff('day', a.o_orderdate, b.o_orderdate)) <= 60
       ORDER BY custkey, order_a, order_b LIMIT 200"""

  // --------------------------------------------------------------- q248
  /** Tukey IQR outlier fences per event type: the quartile reduce
    * (ordered-set percentile_cont, parity pinned by q104) broadcasts
    * back against the events — no per-row window, one wide shuffle. */
  private def q248(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val fences = e.groupBy(col("event_type").as("ft"))
      .agg(expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY value)")
          .as("q1"),
        expr("percentile_cont(0.75) WITHIN GROUP (ORDER BY value)")
          .as("q3"))
    val iqr = col("q3") - col("q1")
    e.join(broadcast(fences), col("event_type") === col("ft"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("value") > col("q3") + lit(1.5) * iqr, 1L)
          .when(col("value") < col("q1") - lit(1.5) * iqr, 1L)
          .otherwise(0L)).as("n_outliers"),
        round(max(col("value")), 4).as("max_value"))
      .orderBy("event_type")
  }

  private val q248Sql =
    """WITH fences AS (
         SELECT event_type,
                percentile_cont(0.25) WITHIN GROUP (ORDER BY value) AS q1,
                percentile_cont(0.75) WITHIN GROUP (ORDER BY value) AS q3
         FROM events GROUP BY 1)
       SELECT e.event_type,
              CAST(count(*) AS BIGINT) AS n_events,
              CAST(sum(CASE WHEN e.value > f.q3 + 1.5 * (f.q3 - f.q1)
                              OR e.value < f.q1 - 1.5 * (f.q3 - f.q1)
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
              round(max(e.value), 4) AS max_value
       FROM events e JOIN fences f ON e.event_type = f.event_type
       GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q249
  /** Calendar-gap detection: days with ZERO orders per year, against a
    * generated date spine (sequence + explode) — monitoring's "did the
    * feed go dark" check. The spine is tiny and driver-free; the
    * distinct order-day reduce joins it on the date key. */
  private def q249(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val bounds = o.agg(min(to_date(col("o_orderdate"))).as("lo"),
      max(to_date(col("o_orderdate"))).as("hi"))
    val spine = bounds.select(explode(
      sequence(col("lo"), col("hi"), expr("interval 1 day"))).as("d"))
    val orderDays = o.select(to_date(col("o_orderdate")).as("od")).distinct()
    spine.join(orderDays, col("d") === col("od"), "left_outer")
      .groupBy(year(col("d")).as("yr"))
      .agg(count(lit(1)).as("n_days"),
        sum(when(col("od").isNull, 1L).otherwise(0L)).as("dark_days"))
      .orderBy("yr")
  }

  private val q249Sql =
    """WITH bounds AS (
         SELECT CAST(min(o_orderdate) AS DATE) AS lo,
                CAST(max(o_orderdate) AS DATE) AS hi FROM orders),
       spine AS (
         SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                     AS DATE) AS d
         FROM bounds),
       order_days AS (
         SELECT DISTINCT CAST(o_orderdate AS DATE) AS d FROM orders)
       SELECT year(s.d) AS yr,
              CAST(count(*) AS BIGINT) AS n_days,
              CAST(sum(CASE WHEN o.d IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                AS dark_days
       FROM spine s LEFT JOIN order_days o ON s.d = o.d
       GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q241_ab_test"          -> q241 _,
    "q242_fog_proxy"        -> q242 _,
    "q243_fuzzy_pairs"      -> q243 _,
    "q244_compound_growth"  -> q244 _,
    "q245_retention_curve"  -> q245 _,
    "q246_price_elasticity" -> q246 _,
    "q247_dup_invoices"     -> q247 _,
    "q248_iqr_outliers"     -> q248 _,
    "q249_dark_days"        -> q249 _)

  override def oracles: Map[String, String] = Map(
    "q241_ab_test"          -> q241Sql,
    "q242_fog_proxy"        -> q242Sql,
    "q243_fuzzy_pairs"      -> q243Sql,
    "q244_compound_growth"  -> q244Sql,
    "q245_retention_curve"  -> q245Sql,
    "q246_price_elasticity" -> q246Sql,
    "q247_dup_invoices"     -> q247Sql,
    "q248_iqr_outliers"     -> q248Sql,
    "q249_dark_days"        -> q249Sql)
}
