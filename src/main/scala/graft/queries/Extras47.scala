package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 43: statistical QA for pipelines — binomial
  * confidence bounds, partition-key health, experiment readouts,
  * column profiling, robust means, and breach-run detection.
  *
  * Every statistic here is either pure integer arithmetic (χ² via the
  * (64o−N)² identity, trimmed means, profiling counts, islands) or a
  * per-row closed form over exact integer inputs (Wilson bounds, the
  * two-proportion z) — no cross-row double folds anywhere, so nothing
  * leans on rounding for determinism. */
object Extras47 extends QueryPack {

  // --------------------------------------------------------------- q301
  /** Wilson 95% score interval on the return rate per brand — the
    * binomial bound that stays sane at small n, closed form per row:
    * (p̂ + z²/2n ± z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n). */
  private def q301(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val z = lit(1.96)
    val base = t("lineitem")
      .join(broadcast(t("part")), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("r"))
    val p = col("r").cast("double") / col("n")
    val nD = col("n").cast("double")
    val half = z * sqrt(p * (lit(1.0) - p) / nD
      + z * z / (lit(4.0) * nD * nD))
    val denom = lit(1.0) + z * z / nD
    base.select(col("brand"), col("n").cast("long").as("n"),
        col("r").cast("long").as("n_returned"),
        round(p, 5).as("rate"),
        round((p + z * z / (lit(2.0) * nD) - half) / denom, 5).as("lo95"),
        round((p + z * z / (lit(2.0) * nD) + half) / denom, 5).as("hi95"))
      .orderBy("brand")
  }

  private val q301Sql =
    """WITH base AS (
         SELECT p.p_brand AS brand, count(*) AS n,
                sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS r
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 1),
       f AS (
         SELECT brand, n, r,
                CAST(r AS DOUBLE) / n AS p, CAST(n AS DOUBLE) AS nd
         FROM base)
       SELECT brand, CAST(n AS BIGINT) AS n, CAST(r AS BIGINT) AS n_returned,
              round(p, 5) AS rate,
              round((p + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
                  / (CAST(2 AS DOUBLE) * nd)
                - CAST(1.96 AS DOUBLE) * sqrt(p * (CAST(1 AS DOUBLE) - p) / nd
                  + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
                    / (CAST(4 AS DOUBLE) * nd * nd)))
                / (CAST(1 AS DOUBLE) + CAST(1.96 AS DOUBLE)
                  * CAST(1.96 AS DOUBLE) / nd), 5) AS lo95,
              round((p + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
                  / (CAST(2 AS DOUBLE) * nd)
                + CAST(1.96 AS DOUBLE) * sqrt(p * (CAST(1 AS DOUBLE) - p) / nd
                  + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE)
                    / (CAST(4 AS DOUBLE) * nd * nd)))
                / (CAST(1 AS DOUBLE) + CAST(1.96 AS DOUBLE)
                  * CAST(1.96 AS DOUBLE) / nd), 5) AS hi95
       FROM f ORDER BY brand"""

  // --------------------------------------------------------------- q302
  /** Partition-key health check: are md5(o_orderkey) buckets uniform?
    * χ² against the uniform expectation via the all-integer identity
    * χ² = Σ(64·o − N)² / (64·N) — the whole statistic is ONE division
    * of two exact integers. The check every engine should run before
    * trusting a hash-partitioning key. */
  private def q302(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val B = 64
    val bk = pmod(conv(substring(md5(encode(col("o_orderkey")
      .cast("string"), "UTF-8")), 1, 8), 16, 10).cast("long"), lit(B))
    val buckets = o.select(bk.as("bk"))
      .groupBy("bk").agg(count(lit(1)).as("c"))
    val tot = buckets.agg(sum("c").as("n"))
    buckets.crossJoin(broadcast(tot))
      .agg(max("n").as("n"), count(lit(1)).as("n_buckets"),
        min("c").as("min_c"), max("c").as("max_c"),
        sum((lit(B) * col("c") - col("n"))
          * (lit(B) * col("c") - col("n"))).as("ss"))
      .select(col("n").cast("long").as("n"),
        col("n_buckets").cast("long").as("n_buckets"),
        col("min_c").cast("long").as("min_c"),
        col("max_c").cast("long").as("max_c"),
        round(col("ss").cast("double") / (lit(B) * col("n")), 4)
          .as("chi2"),
        round(col("max_c").cast("double") / col("min_c"), 4)
          .as("skew_ratio"))
  }

  private val q302Sql =
    """WITH buckets AS (
         SELECT (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                   ::BIGINT) % 64 AS bk,
                count(*) AS c
         FROM orders GROUP BY 1),
       tot AS (SELECT sum(c) AS n FROM buckets)
       SELECT CAST(any_value(n) AS BIGINT) AS n,
              CAST(count(*) AS BIGINT) AS n_buckets,
              CAST(min(c) AS BIGINT) AS min_c,
              CAST(max(c) AS BIGINT) AS max_c,
              round(CAST(sum((64 * c - n) * (64 * c - n)) AS DOUBLE)
                / (64 * any_value(n)), 4) AS chi2,
              round(CAST(max(c) AS DOUBLE) / min(c), 4) AS skew_ratio
       FROM buckets CROSS JOIN tot"""

  // --------------------------------------------------------------- q303
  /** Two-proportion z-test on purchase conversion between the q267
    * md5 experiment arms — the readout that decides the experiment.
    * Counts are exact integers; the z statistic is one closed-form
    * expression (pooled p̂); no simulation, no RNG. */
  private def q303(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    // conversion = a heavy purchaser (≥14 purchase events): mid-range
    // base rate (~50%) so the z statistic actually discriminates —
    // "any purchase" saturates at 100% on this data
    val users = e.groupBy("user_id")
      .agg(when(sum(when(col("event_type") === "purchase", 1L)
        .otherwise(0L)) >= 14, 1L).otherwise(0L).as("converted"))
      .withColumn("variant",
        when(ascii(substring(md5(col("user_id").cast("string")), 1, 1))
          % 2 === 0, "control").otherwise("treatment"))
    val arms = users.groupBy("variant")
      .agg(count(lit(1)).as("n"), sum("converted").as("conv"))
    val wide = arms.agg(
      max(when(col("variant") === "control", col("n"))).as("n1"),
      max(when(col("variant") === "control", col("conv"))).as("c1"),
      max(when(col("variant") === "treatment", col("n"))).as("n2"),
      max(when(col("variant") === "treatment", col("conv"))).as("c2"))
    val p1 = col("c1").cast("double") / col("n1")
    val p2 = col("c2").cast("double") / col("n2")
    val pp = (col("c1") + col("c2")).cast("double") /
      (col("n1") + col("n2"))
    wide.select(
      col("n1").cast("long").as("n_control"),
      col("n2").cast("long").as("n_treatment"),
      round(p1, 5).as("rate_control"),
      round(p2, 5).as("rate_treatment"),
      round(p2 - p1, 5).as("lift"),
      round((p2 - p1) / sqrt(pp * (lit(1.0) - pp)
        * (lit(1.0) / col("n1") + lit(1.0) / col("n2"))), 4).as("z"))
  }

  private val q303Sql =
    """WITH users AS (
         SELECT user_id,
                CASE WHEN sum(CASE WHEN event_type = 'purchase'
                  THEN 1 ELSE 0 END) >= 14 THEN 1 ELSE 0 END AS converted
         FROM events GROUP BY 1),
       tagged AS (
         SELECT CASE WHEN ascii(substr(md5(CAST(user_id AS VARCHAR)), 1, 1))
                       % 2 = 0
                     THEN 'control' ELSE 'treatment' END AS variant,
                converted
         FROM users),
       arms AS (SELECT variant, count(*) AS n, sum(converted) AS conv
                FROM tagged GROUP BY 1),
       wide AS (
         SELECT max(CASE WHEN variant = 'control' THEN n END) AS n1,
                max(CASE WHEN variant = 'control' THEN conv END) AS c1,
                max(CASE WHEN variant = 'treatment' THEN n END) AS n2,
                max(CASE WHEN variant = 'treatment' THEN conv END) AS c2
         FROM arms),
       f AS (
         SELECT n1, n2,
                CAST(c1 AS DOUBLE) / n1 AS p1,
                CAST(c2 AS DOUBLE) / n2 AS p2,
                CAST(c1 + c2 AS DOUBLE) / (n1 + n2) AS pp
         FROM wide)
       SELECT CAST(n1 AS BIGINT) AS n_control,
              CAST(n2 AS BIGINT) AS n_treatment,
              round(p1, 5) AS rate_control,
              round(p2, 5) AS rate_treatment,
              round(p2 - p1, 5) AS lift,
              round((p2 - p1) / sqrt(pp * (CAST(1 AS DOUBLE) - pp)
                * (CAST(1 AS DOUBLE) / n1 + CAST(1 AS DOUBLE) / n2)), 4)
                AS z
       FROM f"""

  // --------------------------------------------------------------- q304
  /** Column-profiling surface: rows / distinct / nulls / top-value
    * share for the join keys the engine actually shuffles on — the
    * profile that predicts skew before it bites. Long-form union of
    * per-key aggregates; top-1 share via one ordered pick per key. */
  private def q304(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    def profile(df: DataFrame, table: String, column: String)
    : DataFrame = {
      val c = col(column)
      val top = df.filter(c.isNotNull).groupBy(c.as("v"))
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("v").asc).limit(1)
        .select(col("cnt").as("top1"))
      df.agg(count(lit(1)).as("n_rows"),
          countDistinct(c).as("n_distinct"),
          sum(when(c.isNull, 1L).otherwise(0L)).as("n_null"))
        .crossJoin(broadcast(top))
        .select(lit(table).as("tbl"), lit(column).as("col"),
          col("n_rows").cast("long").as("n_rows"),
          col("n_distinct").cast("long").as("n_distinct"),
          col("n_null").cast("long").as("n_null"),
          round(col("top1").cast("double") / col("n_rows"), 5)
            .as("top1_share"))
    }
    profile(t("orders"), "orders", "o_custkey")
      .unionByName(profile(t("lineitem"), "lineitem", "l_partkey"))
      .unionByName(profile(t("customer"), "customer", "c_nationkey"))
      .unionByName(profile(t("events"), "events", "user_id"))
      .orderBy("tbl", "col")
  }

  private val q304Sql = {
    def one(table: String, column: String) =
      s"""SELECT '$table' AS tbl, '$column' AS col,
            CAST(count(*) AS BIGINT) AS n_rows,
            CAST(count(DISTINCT $column) AS BIGINT) AS n_distinct,
            CAST(sum(CASE WHEN $column IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_null,
            round(CAST((SELECT count(*) AS c FROM $table
                        WHERE $column IS NOT NULL
                        GROUP BY $column
                        ORDER BY c DESC, $column ASC LIMIT 1) AS DOUBLE)
              / count(*), 5) AS top1_share
          FROM $table"""
    Seq(one("orders", "o_custkey"), one("lineitem", "l_partkey"),
        one("customer", "c_nationkey"), one("events", "user_id"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY tbl, col")
  }

  // --------------------------------------------------------------- q305
  /** 10%-trimmed vs raw mean order value per order priority — the
    * robust-location screen. The trim bounds come from integer row
    * numbers, the trimmed mean is an exact-cents sum over the kept
    * rows divided once — all integer until the final division. */
  private def q305(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val cents = o.select(col("o_orderpriority").as("prio"),
      floor(col("o_totalprice") * 100 + 0.5).as("c"),
      col("o_orderkey"))
    val w = Window.partitionBy("prio").orderBy(col("c"), col("o_orderkey"))
    val wn = Window.partitionBy("prio")
    cents
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("cut", floor(col("n") / 10))
      .groupBy("prio")
      .agg(max("n").as("n"),
        sum("c").as("s_all"),
        sum(when(col("rn") > col("cut")
          && col("rn") <= col("n") - col("cut"), col("c"))).as("s_trim"),
        sum(when(col("rn") > col("cut")
          && col("rn") <= col("n") - col("cut"), 1L).otherwise(0L))
          .as("n_trim"))
      .select(col("prio"), col("n").cast("long").as("n"),
        round(col("s_all").cast("double") / col("n") / 100, 4)
          .as("mean"),
        round(col("s_trim").cast("double") / col("n_trim") / 100, 4)
          .as("trimmed_mean"))
      .orderBy("prio")
  }

  private val q305Sql =
    """WITH cents AS (
         SELECT o_orderpriority AS prio,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
                o_orderkey
         FROM orders),
       ranked AS (
         SELECT prio, c,
                row_number() OVER (PARTITION BY prio
                  ORDER BY c, o_orderkey) AS rn,
                count(*) OVER (PARTITION BY prio) AS n
         FROM cents),
       cut AS (SELECT *, CAST(floor(n / 10) AS BIGINT) AS cut FROM ranked)
       SELECT prio, CAST(any_value(n) AS BIGINT) AS n,
              round(CAST(sum(c) AS DOUBLE) / any_value(n) / 100, 4)
                AS mean,
              round(CAST(sum(CASE WHEN rn > cut AND rn <= n - cut
                  THEN c END) AS DOUBLE)
                / sum(CASE WHEN rn > cut AND rn <= n - cut
                  THEN 1 ELSE 0 END) / 100, 4) AS trimmed_mean
       FROM cut GROUP BY prio ORDER BY prio"""

  // --------------------------------------------------------------- q306
  /** SLA-breach runs: days whose p95 order value exceeds the all-time
    * p95 form consecutive-day runs (the gaps-and-islands date trick on
    * an integer day index). Breach booleans compare two q104-parity
    * percentiles — identical doubles — and everything after is
    * integer arithmetic. */
  private def q306(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val cents = o.select(col("o_orderdate").as("d"),
      floor(col("o_totalprice") * 100 + 0.5).as("c"))
    val daily = cents.groupBy("d")
      .agg(percentile(col("c"), lit(0.95)).as("p95"))
    val global = cents.agg(percentile(col("c"), lit(0.95)).as("g95"))
    val breach = daily.crossJoin(broadcast(global))
      .filter(col("p95") > col("g95"))
      .withColumn("di", datediff(col("d"), lit("1990-01-01")))
      .withColumn("rn", row_number().over(Window.orderBy("di")))
      .withColumn("grp", col("di") - col("rn"))
    val runs = breach.groupBy("grp")
      .agg(count(lit(1)).as("len"), min("d").as("start"))
    runs.agg(sum("len").as("n_breach_days"),
        count(lit(1)).as("n_runs"),
        max("len").as("longest"))
      .crossJoin(broadcast(runs.orderBy(col("len").desc, col("start").asc)
        .limit(1).select(col("start").as("longest_start"))))
      .select(col("n_breach_days").cast("long").as("n_breach_days"),
        col("n_runs").cast("long").as("n_runs"),
        col("longest").cast("long").as("longest_run_days"),
        col("longest_start").cast("date").as("longest_run_start"))
  }

  private val q306Sql =
    """WITH cents AS (
         SELECT CAST(o_orderdate AS DATE) AS d,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
         FROM orders),
       daily AS (SELECT d, quantile_cont(c, 0.95) AS p95
                 FROM cents GROUP BY 1),
       gq AS (SELECT quantile_cont(c, 0.95) AS g95 FROM cents),
       breach AS (
         SELECT d,
                datediff('day', DATE '1990-01-01', d)
                  - row_number() OVER (ORDER BY d) AS grp
         FROM daily CROSS JOIN gq WHERE p95 > g95),
       runs AS (SELECT grp, count(*) AS len, min(d) AS start
                FROM breach GROUP BY 1),
       top AS (SELECT start AS longest_start FROM runs
               ORDER BY len DESC, start ASC LIMIT 1)
       SELECT CAST(sum(len) AS BIGINT) AS n_breach_days,
              CAST(count(*) AS BIGINT) AS n_runs,
              CAST(max(len) AS BIGINT) AS longest_run_days,
              CAST(any_value(longest_start) AS DATE) AS longest_run_start
       FROM runs CROSS JOIN top"""

  override def queries: Map[String, QueryFn] = Map(
    "q301_wilson_returns"  -> q301 _,
    "q302_hash_uniformity" -> q302 _,
    "q303_ab_ztest"        -> q303 _,
    "q304_key_profile"     -> q304 _,
    "q305_trimmed_mean"    -> q305 _,
    "q306_sla_breach_runs" -> q306 _)

  override def oracles: Map[String, String] = Map(
    "q301_wilson_returns"  -> q301Sql,
    "q302_hash_uniformity" -> q302Sql,
    "q303_ab_ztest"        -> q303Sql,
    "q304_key_profile"     -> q304Sql,
    "q305_trimmed_mean"    -> q305Sql,
    "q306_sla_breach_runs" -> q306Sql)
}
