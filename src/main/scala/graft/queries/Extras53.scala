package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 49 (final): key-space utilization, sampling
  * bias, lexical histograms, autocorrelation tables, merchandising
  * keywords, and seasonality strength — the last loose ends of the
  * platform-QA surface.
  *
  * Numerics: integer/exact-cents throughout; corr (q256 precedent)
  * and η² from decimal-exact sum algebra are the only doubles. */
object Extras53 extends QueryPack {

  // --------------------------------------------------------------- q337
  /** Key-space utilization audit: density and largest hole of the
    * order-key sequence — the check that catches a broken id
    * generator or a partial load. All integers.
    *
    * Adjacency comes from [[graft.operators.RowIndexer]] (range
    * shuffle + offset stamp, then an equi-join of row i against row
    * i−1 on the stamped index) — `lag() OVER (ORDER BY k)` would pull
    * the whole key column through ONE task. n/min/max need no order
    * at all; only max_gap reads the pair relation (1-row broadcast
    * cross, the q315/q316 scalar pattern). */
  private def q337(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RowIndexer
    val o = Tables(s, dir)("orders")
    val keys = o.select(col("o_orderkey").as("k"))
    val idxd = RowIndexer.stableIndex(keys, Seq(col("k")))
      .localCheckpoint() // both join legs read the index
    val prv = idxd.select(col("k").as("pk"), (col("idx") + 1).as("idx"))
    val maxGap = idxd.join(prv, "idx")
      .agg(max(col("k") - col("pk")).as("max_gap"))
    keys.agg(count(lit(1)).as("n"),
        min("k").as("min_k"), max("k").as("max_k"))
      .crossJoin(broadcast(maxGap))
      .select(col("n").cast("long").as("n_keys"),
        col("min_k").cast("long").as("min_key"),
        col("max_k").cast("long").as("max_key"),
        col("max_gap").cast("long").as("largest_gap"),
        round(col("n").cast("double")
          / (col("max_k") - col("min_k") + 1), 6).as("utilization"))
  }

  private val q337Sql =
    """WITH gaps AS (
         SELECT o_orderkey AS k,
                o_orderkey - lag(o_orderkey) OVER (ORDER BY o_orderkey)
                  AS gap
         FROM orders)
       SELECT CAST(count(*) AS BIGINT) AS n_keys,
              CAST(min(k) AS BIGINT) AS min_key,
              CAST(max(k) AS BIGINT) AS max_key,
              CAST(max(gap) AS BIGINT) AS largest_gap,
              round(CAST(count(*) AS DOUBLE) / (max(k) - min(k) + 1), 6)
                AS utilization
       FROM gaps"""

  // --------------------------------------------------------------- q338
  /** Sampling-bias audit: a deterministic 10% md5 sample of orders vs
    * the full table, revenue share per nation — the per-stratum
    * relative error that says whether the sample is safe to prototype
    * on. Exact-cents shares on both sides. */
  private def q338(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val o = t("orders")
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(t("nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name").as("nation"),
        floor(col("o_totalprice") * 100 + 0.5).as("c"),
        (pmod(conv(substring(md5(col("o_orderkey").cast("string")), 1, 8),
          16, 10).cast("long"), lit(10)) === 0).as("in_sample"))
    val full = o.groupBy("nation").agg(sum("c").as("fc"))
    val fullTot = full.agg(sum("fc").as("ft"))
    val samp = o.filter(col("in_sample")).groupBy("nation")
      .agg(sum("c").as("sc"))
    val sampTot = samp.agg(sum("sc").as("st"))
    full.join(samp, Seq("nation"), "left")
      .crossJoin(broadcast(fullTot)).crossJoin(broadcast(sampTot))
      .select(col("nation"),
        round(col("fc").cast("double") / col("ft"), 6).as("full_share"),
        round(coalesce(col("sc"), lit(0L)).cast("double") / col("st"), 6)
          .as("sample_share"),
        round(coalesce(col("sc"), lit(0L)).cast("double") / col("st")
          - col("fc").cast("double") / col("ft"), 6).as("share_error"))
      .orderBy("nation")
  }

  private val q338Sql =
    """WITH o AS (
         SELECT n.n_name AS nation,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
                (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                  ::BIGINT) % 10 = 0 AS in_sample
         FROM orders
           JOIN customer cu ON o_custkey = cu.c_custkey
           JOIN nation n ON cu.c_nationkey = n.n_nationkey),
       fl AS (SELECT nation, sum(c) AS fc FROM o GROUP BY 1),
       ft AS (SELECT sum(fc) AS ft FROM fl),
       samp AS (SELECT nation, sum(c) AS sc FROM o
                WHERE in_sample GROUP BY 1),
       st AS (SELECT sum(sc) AS st FROM samp)
       SELECT fl.nation,
              round(CAST(fc AS DOUBLE) / ft, 6) AS full_share,
              round(CAST(coalesce(sc, 0) AS DOUBLE) / st, 6)
                AS sample_share,
              round(CAST(coalesce(sc, 0) AS DOUBLE) / st
                - CAST(fc AS DOUBLE) / ft, 6) AS share_error
       FROM fl LEFT JOIN samp ON fl.nation = samp.nation
            CROSS JOIN ft CROSS JOIN st
       ORDER BY fl.nation"""

  // --------------------------------------------------------------- q339
  /** Word-length histogram of the corpus (1..15+, capped): counts and
    * shares — the lexical fingerprint that shifts under tokenizer or
    * language drift. Pure integers from one explode. */
  private def q339(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val toks = d.select(
      explode(filter(split(lower(col("text")), "[^a-z]+"),
        w => length(w) > 0)).as("w"))
    val hist = toks.select(least(length(col("w")), lit(15)).as("len"))
      .groupBy("len").agg(count(lit(1)).as("n"))
    val tot = hist.agg(sum("n").as("t"))
    hist.crossJoin(broadcast(tot))
      .select(col("len").cast("int").as("word_len"),
        col("n").cast("long").as("n_words"),
        round(col("n").cast("double") / col("t"), 6).as("share"))
      .orderBy("word_len")
  }

  private val q339Sql =
    """WITH toks AS (
         SELECT t.w
         FROM documents,
              unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(w)
         WHERE t.w <> ''),
       hist AS (
         SELECT least(length(w), 15) AS len, count(*) AS n
         FROM toks GROUP BY 1),
       tot AS (SELECT sum(n) AS t FROM hist)
       SELECT CAST(len AS INT) AS word_len, CAST(n AS BIGINT) AS n_words,
              round(CAST(n AS DOUBLE) / t, 6) AS share
       FROM hist CROSS JOIN tot ORDER BY word_len"""

  // --------------------------------------------------------------- q340
  /** Autocorrelation table of monthly revenue at lags 1-6 (extends
    * q256's single lag): exact-cents monthly sums, one lag window per
    * k, the corr aggregate at the established round(4) precedent —
    * the seasonality scan that picks the ARIMA order. */
  private def q340(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val m = o.groupBy(date_trunc("month", col("o_orderdate")).as("mo"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).as("c"))
    val w = Window.orderBy("mo")
    val lagged = (1 to 6).foldLeft(m) { (df, k) =>
      df.withColumn(s"l$k", lag(col("c"), k).over(w))
    }
    val rows = (1 to 6).map { k =>
      lagged.filter(col(s"l$k").isNotNull)
        .agg(count(lit(1)).as("n"),
          corr(col("c").cast("double"), col(s"l$k").cast("double"))
            .as("r"))
        .select(lit(k).as("lag"), col("n"), round(col("r"), 4).as("acf"))
    }
    rows.reduce(_ unionByName _)
      .select(col("lag").cast("int").as("lag"),
        col("n").cast("long").as("n_pairs"), col("acf"))
      .orderBy("lag")
  }

  private val q340Sql = {
    val lags = (1 to 6).map(k =>
      s"lag(c, $k) OVER (ORDER BY mo) AS l$k").mkString(", ")
    val rows = (1 to 6).map { k =>
      s"""SELECT $k AS lag, count(*) AS n,
            round(corr(CAST(c AS DOUBLE), CAST(l$k AS DOUBLE)), 4) AS acf
          FROM lagged WHERE l$k IS NOT NULL"""
    }
    s"""WITH m AS (
         SELECT date_trunc('month', o_orderdate) AS mo,
                sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
         FROM orders GROUP BY 1),
       lagged AS (SELECT mo, c, $lags FROM m)
       SELECT CAST(lag AS INT) AS lag, CAST(n AS BIGINT) AS n_pairs, acf
       FROM (${rows.mkString("\nUNION ALL\n")})
       ORDER BY lag"""
  }

  // --------------------------------------------------------------- q341
  /** Merchandising keywords: top-20 part-name tokens by attached
    * lineitem revenue — which product words actually sell. Exact
    * cents; the part-token explode happens on the SMALL dimension and
    * joins back to the fact by key (never exploding the fact). */
  private def q341(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val rev = t("lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5)).as("c"),
        count(lit(1)).as("n"))
    val tokens = t("part").select(col("p_partkey").as("pk"),
      explode(split(col("p_name"), " ")).as("tok"))
    tokens.join(rev, "pk")
      .groupBy("tok")
      .agg(sum("c").as("cents"), sum("n").as("n_lines"))
      .orderBy(col("cents").desc, col("tok"))
      .limit(20)
      .select(col("tok").as("token"),
        round(col("cents").cast("double") / 100, 2).as("revenue"),
        col("n_lines").cast("long").as("n_lines"))
  }

  private val q341Sql =
    """WITH rev AS (
         SELECT l_partkey AS pk,
                sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                  AS c,
                count(*) AS n
         FROM lineitem GROUP BY 1),
       tokens AS (
         SELECT p_partkey AS pk, t.tok
         FROM part, unnest(string_split(p_name, ' ')) AS t(tok))
       SELECT tok AS token,
              round(CAST(sum(c) AS DOUBLE) / 100, 2) AS revenue,
              CAST(sum(n) AS BIGINT) AS n_lines
       FROM tokens JOIN rev USING (pk)
       GROUP BY tok ORDER BY sum(c) DESC, tok LIMIT 20"""

  // --------------------------------------------------------------- q342
  /** Day-of-week seasonality strength: η² = 1 − SS_within/SS_total of
    * daily revenue grouped by weekday, from decimal-exact sum algebra
    * (the q320 overflow-safe pattern) — one number that says how much
    * of daily variance the weekly cycle explains. dayofweek() is
    * 1=Sunday..7 in BOTH Spark and DuckDB. */
  private def q342(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val daily = o.groupBy(col("o_orderdate").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).as("c"))
      .select(dayofweek(col("d")).as("dow"),
        col("c").cast("decimal(18,0)").as("c"))
    val per = daily.groupBy("dow")
      .agg(count(lit(1)).as("g"), sum("c").as("s"),
        sum(col("c") * col("c")).as("qq"))
    // s² stays exact in decimal, drops to double BEFORE the /g so both
    // engines do the same double division (DuckDB's / on integers is
    // double division; Spark's decimal/decimal would diverge)
    per.agg(sum("g").as("n"), sum("s").as("ts"), sum("qq").as("tq"),
        sum((col("s") * col("s")).cast("decimal(38,0)").cast("double")
          / col("g")).as("bg"))
      .select(col("n").cast("long").as("n_days"),
        round(lit(1.0)
          - (col("tq").cast("double")
              - col("bg").cast("double"))
            / (col("tq").cast("double")
              - col("ts").cast("double") * col("ts").cast("double")
                / col("n")), 5).as("eta_squared"))
  }

  private val q342Sql =
    """WITH daily AS (
         SELECT dayofweek(d) AS dow, c FROM (
           SELECT CAST(o_orderdate AS DATE) AS d,
                  sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
           FROM orders GROUP BY 1)),
       per AS (
         SELECT dow, count(*) AS g, sum(c) AS s, sum(c * c) AS qq
         FROM daily GROUP BY 1)
       SELECT CAST(sum(g) AS BIGINT) AS n_days,
              round(CAST(1 AS DOUBLE)
                - (CAST(sum(qq) AS DOUBLE)
                    - sum(CAST(s * s AS DOUBLE) / g))
                  / (CAST(sum(qq) AS DOUBLE)
                    - CAST(sum(s) AS DOUBLE) * CAST(sum(s) AS DOUBLE)
                      / sum(g)), 5) AS eta_squared
       FROM per"""

  override def queries: Map[String, QueryFn] = Map(
    "q337_keyspace_audit" -> q337 _,
    "q338_sample_bias"    -> q338 _,
    "q339_word_len_hist"  -> q339 _,
    "q340_acf_table"      -> q340 _,
    "q341_name_revenue"   -> q341 _,
    "q342_dow_eta_squared" -> q342 _)

  override def oracles: Map[String, String] = Map(
    "q337_keyspace_audit" -> q337Sql,
    "q338_sample_bias"    -> q338Sql,
    "q339_word_len_hist"  -> q339Sql,
    "q340_acf_table"      -> q340Sql,
    "q341_name_revenue"   -> q341Sql,
    "q342_dow_eta_squared" -> q342Sql)
  }
