package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 40: price-index economics, distribution
  * drift, smoothing, resampling-free uncertainty, and sketch-quality
  * audits — closing the measurement-methodology corner of the
  * analytics surface.
  *
  * Numeric discipline per the house rules: every cross-row double sum
  * either reduces to exact integer arithmetic (price indices, Poisson
  * λ), folds in a shared deterministic order (EWMA's explicit lag
  * chain), or is absorbed by a 4-5-decimal round with established
  * precedent (entropy-family sums, q189/q142/q278).
  */
object Extras44 extends QueryPack {

  /** md5-derived bucket/hash — identical in Spark and DuckDB (the
    * DedupOracles q43 family): int64 of the first 8 md5 hex chars. */
  private def mdHash(s: Column): Column =
    conv(substring(md5(encode(s, "UTF-8")), 1, 8), 16, 10).cast("long")

  // --------------------------------------------------------------- q283
  /** Laspeyres / Paasche / Fisher price indices per ship year against
    * the first year as base, at part grain. Unit prices are ROUNDED TO
    * INTEGER CENTS per (part, year) — so every index numerator and
    * denominator is a pure BIGINT sum of cents×quantity products and
    * the final ratios are single exact-int divisions, identical in
    * both engines. Parts must trade in both the base year and the
    * observed year (matched-model index). The 1-row base-year scalar
    * rides a broadcast cross join (documented BNLJ pattern). */
  private def q283(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir)("lineitem")
    val py = l.groupBy(col("l_partkey").as("pk"),
        year(col("l_shipdate")).as("yr"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5)).as("cents"),
        sum(col("l_quantity")).cast("long").as("qty"))
      .select(col("pk"), col("yr"),
        floor(col("cents").cast("double") / col("qty") + 0.5)
          .cast("long").as("p"),
        col("qty"))
    val baseYr = py.agg(min("yr").as("byr"))
    val base = py.crossJoin(broadcast(baseYr))
      .filter(col("yr") === col("byr"))
      .select(col("pk"), col("p").as("p0"), col("qty").as("q0"))
    // observed years only; the base year's index is trivially 1
    py.join(base, "pk")
      .join(broadcast(baseYr), col("yr") > col("byr"))
      .groupBy("yr")
      .agg(count(lit(1)).as("n_parts"),
        sum(col("p") * col("q0")).as("l_num"),
        sum(col("p0") * col("q0")).as("l_den"),
        sum(col("p") * col("qty")).as("p_num"),
        sum(col("p0") * col("qty")).as("p_den"))
      .select(col("yr").cast("int").as("yr"),
        col("n_parts").cast("long").as("n_parts"),
        round(col("l_num").cast("double") / col("l_den"), 5)
          .as("laspeyres"),
        round(col("p_num").cast("double") / col("p_den"), 5)
          .as("paasche"),
        round(sqrt((col("l_num").cast("double") / col("l_den"))
          * (col("p_num").cast("double") / col("p_den"))), 5)
          .as("fisher"))
      .orderBy("yr")
  }

  private val q283Sql =
    """WITH py AS (
         SELECT l_partkey AS pk, CAST(year(l_shipdate) AS INT) AS yr,
                CAST(floor(CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                    AS BIGINT)) AS DOUBLE)
                  / CAST(sum(l_quantity) AS BIGINT) + 0.5) AS BIGINT) AS p,
                CAST(sum(l_quantity) AS BIGINT) AS qty
         FROM lineitem GROUP BY 1, 2),
       byr AS (SELECT min(yr) AS byr FROM py),
       base AS (
         SELECT pk, p AS p0, qty AS q0
         FROM py CROSS JOIN byr WHERE yr = byr),
       idx AS (
         SELECT py.yr, count(*) AS n_parts,
                sum(py.p * base.q0)  AS l_num,
                sum(base.p0 * base.q0) AS l_den,
                sum(py.p * py.qty)   AS p_num,
                sum(base.p0 * py.qty) AS p_den
         FROM py JOIN base USING (pk) CROSS JOIN byr
         WHERE py.yr > byr
         GROUP BY py.yr)
       SELECT yr, CAST(n_parts AS BIGINT) AS n_parts,
              round(CAST(l_num AS DOUBLE) / l_den, 5) AS laspeyres,
              round(CAST(p_num AS DOUBLE) / p_den, 5) AS paasche,
              round(sqrt((CAST(l_num AS DOUBLE) / l_den)
                * (CAST(p_num AS DOUBLE) / p_den)), 5) AS fisher
       FROM idx ORDER BY yr"""

  // --------------------------------------------------------------- q284
  /** Jensen-Shannon divergence (nats) of each source's word
    * distribution from the whole-corpus distribution — the standard
    * "which slice drifted" monitor over a training mix. SPARSE form:
    * only (source, word) pairs the source actually uses join the
    * corpus stats (one equi-join, no dense source×vocab grid — the
    * shape that survives a 100 TB vocabulary); the entire p=0 tail
    * collapses to its closed form ln2·(1−Σ_{w∈S} q), since p=0 ⇒
    * m=q/2 ⇒ the term is exactly q·ln2. The per-source double sum is
    * absorbed by round(5) — the q189/q278 entropy-sum precedent. */
  private def q284(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val toks = d.select(col("source"),
      explode(filter(split(lower(col("text")), "[^a-z]+"),
        w => length(w) > 0)).as("w"))
    val srcCnt = toks.groupBy("source", "w").agg(count(lit(1)).as("cs"))
    val srcTot = toks.groupBy("source").agg(count(lit(1)).as("ns"))
    val corpus = toks.groupBy("w").agg(count(lit(1)).as("cw"))
    val corpTot = toks.agg(count(lit(1)).as("n"))
    val sparse = srcCnt.join(broadcast(corpus), "w")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(corpTot))
      .select(col("source"),
        (col("cs").cast("double") / col("ns")).as("p"),
        (col("cw").cast("double") / col("n")).as("q"))
      .withColumn("m", (col("p") + col("q")) / 2)
      .withColumn("term",
        col("p") * log(col("p") / col("m"))
          + col("q") * log(col("q") / col("m")))
    sparse.groupBy("source")
      .agg(round((sum(col("term"))
        + log(lit(2.0)) * (lit(1.0) - sum(col("q")))) / 2, 5)
        .as("js_nats"))
      .orderBy("source")
  }

  private val q284Sql =
    """WITH toks AS (
         SELECT source, t.w
         FROM documents,
              unnest(regexp_split_to_array(lower(text), '[^a-z]+')) AS t(w)
         WHERE t.w <> ''),
       sc AS (SELECT source, w, count(*) AS cs FROM toks GROUP BY 1, 2),
       st AS (SELECT source, count(*) AS ns FROM toks GROUP BY 1),
       cw AS (SELECT w, count(*) AS cw FROM toks GROUP BY 1),
       ct AS (SELECT count(*) AS n FROM toks),
       sparse AS (
         SELECT sc.source,
                CAST(sc.cs AS DOUBLE) / st.ns AS p,
                CAST(cw.cw AS DOUBLE) / ct.n AS q
         FROM sc JOIN cw USING (w) JOIN st USING (source) CROSS JOIN ct),
       terms AS (
         SELECT source,
                p * ln(p / ((p + q) / 2)) + q * ln(q / ((p + q) / 2)) AS term,
                q
         FROM sparse)
       SELECT source,
              round((sum(term) + ln(2.0) * (1.0 - sum(q))) / 2, 5) AS js_nats
       FROM terms GROUP BY source ORDER BY source"""

  // --------------------------------------------------------------- q285
  /** 14-term exponentially-weighted moving average (α-decay 0.8) of
    * daily order revenue, sampled on the first of each month. The
    * weighted sum is an EXPLICIT lag chain — fourteen cents×weight
    * products added left-to-right in the same written order in both
    * engines — so the fold is deterministic, not a shuffle-order
    * aggregate. Weight literals come from one Scala computation and
    * are embedded verbatim in both surfaces. Row-grain = the trading
    * day grid (gaps close up, documented EWMA-on-ticks semantics). */
  private val ewmaK = 14
  private val ewmaW: Seq[Double] =
    (0 until ewmaK).map(i => math.pow(0.8, i))
  private val ewmaWSum: Double = ewmaW.foldLeft(0.0)(_ + _)

  private def q285(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val daily = o.groupBy(col("o_orderdate").as("d"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5)).as("c"))
    val w = Window.orderBy("d")
    val chain = (0 until ewmaK).map { i =>
      (if (i == 0) col("c") else lag(col("c"), i).over(w))
        .cast("double") * lit(ewmaW(i))
    }.reduceLeft(_ + _)
    daily
      .withColumn("rn", row_number().over(w))
      .withColumn("ewma_c", chain / lit(ewmaWSum))
      .filter(col("rn") > ewmaK - 1 && dayofmonth(col("d")) === 1)
      .select(col("d").cast("date").as("d"),
        col("c").cast("long").as("day_cents"),
        round(col("ewma_c") / 100, 4).as("ewma_rev"))
      .orderBy("d")
  }

  private val q285Sql = {
    val chain = (0 until ewmaK).map { i =>
      val src = if (i == 0) "CAST(c AS DOUBLE)"
                else s"CAST(lag(c, $i) OVER (ORDER BY d) AS DOUBLE)"
      s"$src * ${ewmaW(i)}"
    }.mkString(" + ")
    s"""WITH daily AS (
         SELECT CAST(o_orderdate AS DATE) AS d,
                sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS c
         FROM orders GROUP BY 1),
       chain AS (
         SELECT d, c,
                row_number() OVER (ORDER BY d) AS rn,
                ($chain) / $ewmaWSum AS ewma_c
         FROM daily)
       SELECT d, CAST(c AS BIGINT) AS day_cents,
              round(ewma_c / 100, 4) AS ewma_rev
       FROM chain WHERE rn > ${ewmaK - 1} AND day(d) = 1 ORDER BY d"""
  }

  // --------------------------------------------------------------- q286
  /** Grouped-jackknife standard error of the mean order value: orders
    * land in 10 deterministic md5 buckets, each leave-one-bucket-out
    * estimate comes from EXACT integer (cents, count) complements, and
    * the variance of the 10 pseudo-estimates uses the explicit
    * two-pass formula mirrored verbatim in the oracle. The only
    * cross-row double folds are over the 10-row bucket frame —
    * absorbed by round(4). */
  private def q286(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val b = o.select(
        pmod(mdHash(col("o_orderkey").cast("string")), lit(10)).as("bk"),
        floor(col("o_totalprice") * 100 + 0.5).as("cents"))
      .groupBy("bk")
      .agg(sum("cents").as("s"), count(lit(1)).as("cnt"))
    val tot = b.agg(sum("s").as("ts"), sum("cnt").as("tn"),
      count(lit(1)).as("g"))
    val thetas = b.crossJoin(broadcast(tot))
      .select(col("g"), col("ts"), col("tn"),
        ((col("ts") - col("s")).cast("double")
          / (col("tn") - col("cnt"))).as("th"))
    val tbar = thetas.agg(avg("th").as("tb"))
    thetas.crossJoin(broadcast(tbar))
      .groupBy("g", "ts", "tn", "tb")
      .agg(sum((col("th") - col("tb")) * (col("th") - col("tb")))
        .as("ss"))
      .select(col("g").cast("long").as("g_buckets"),
        round(col("ts").cast("double") / col("tn") / 100, 4)
          .as("avg_order_value"),
        round(sqrt((col("g") - 1).cast("double") / col("g")
          * col("ss")) / 100, 4).as("jackknife_se"))
  }

  private val q286Sql =
    """WITH b AS (
         SELECT (('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                   ::BIGINT) % 10 AS bk,
                sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS s,
                count(*) AS cnt
         FROM orders GROUP BY 1),
       tot AS (SELECT sum(s) AS ts, sum(cnt) AS tn, count(*) AS g FROM b),
       th AS (
         SELECT g, ts, tn,
                CAST(ts - s AS DOUBLE) / (tn - cnt) AS th
         FROM b CROSS JOIN tot),
       tb AS (SELECT avg(th) AS tb FROM th)
       SELECT CAST(g AS BIGINT) AS g_buckets,
              round(CAST(ts AS DOUBLE) / tn / 100, 4) AS avg_order_value,
              round(sqrt(CAST(g - 1 AS DOUBLE) / g
                * sum((th - tb.tb) * (th - tb.tb))) / 100, 4)
                AS jackknife_se
       FROM th CROSS JOIN tb GROUP BY g, ts, tn, tb.tb"""

  // --------------------------------------------------------------- q287
  /** Poisson goodness-of-fit of the items-per-order distribution:
    * λ is the exact integer ratio total_lines/total_orders, expected
    * counts are the per-row closed form N·e^-λ·λ^k/k! (identical
    * scalar expression trees — no cross-row float folds at all), and
    * the observed/expected ratio flags where the basket-size
    * distribution leaves Poisson. */
  private def q287(s: SparkSession, dir: String): DataFrame = {
    val l = Tables(s, dir)("lineitem")
    val k = l.groupBy("l_orderkey").agg(count(lit(1)).as("k"))
    val dist = k.groupBy("k").agg(count(lit(1)).as("observed"))
    val tot = dist.agg(sum(col("k") * col("observed")).as("lines"),
      sum("observed").as("n"))
    dist.crossJoin(broadcast(tot))
      .withColumn("lambda", col("lines").cast("double") / col("n"))
      .select(col("k").cast("long").as("k"),
        col("observed").cast("long").as("observed"),
        round(col("n") * exp(-col("lambda"))
          * pow(col("lambda"), col("k").cast("double"))
          / factorial(col("k").cast("int")), 4).as("expected"),
        round(col("observed").cast("double")
          / (col("n") * exp(-col("lambda"))
            * pow(col("lambda"), col("k").cast("double"))
            / factorial(col("k").cast("int"))), 4).as("obs_exp_ratio"))
      .orderBy("k")
  }

  private val q287Sql =
    """WITH ko AS (
         SELECT l_orderkey, count(*) AS k FROM lineitem GROUP BY 1),
       dist AS (SELECT k, count(*) AS observed FROM ko GROUP BY 1),
       tot AS (SELECT sum(k * observed) AS lines, sum(observed) AS n
               FROM dist),
       fit AS (
         SELECT k, observed,
                CAST(lines AS DOUBLE) / n AS lambda, n
         FROM dist CROSS JOIN tot)
       SELECT CAST(k AS BIGINT) AS k, CAST(observed AS BIGINT) AS observed,
              round(n * exp(-lambda) * pow(lambda, CAST(k AS DOUBLE))
                / factorial(CAST(k AS INT)), 4) AS expected,
              round(CAST(observed AS DOUBLE)
                / (n * exp(-lambda) * pow(lambda, CAST(k AS DOUBLE))
                  / factorial(CAST(k AS INT))), 4) AS obs_exp_ratio
       FROM fit ORDER BY k"""

  // --------------------------------------------------------------- q288
  /** MinHash estimator-quality audit: for every same-source pair in
    * the q43 subsample, the 16-permutation signature estimate is
    * compared against the EXACT shingle-hash Jaccard, bucketed by true
    * similarity decile — count, mean absolute error, mean bias per
    * bucket. Both estimate and truth are exact integer ratios; only
    * the per-bucket averages are double folds (round(4)). Same
    * md5-base affine family as q43, so the audit is fully oracled.
    *
    * The audit sample is capped at an ABSOLUTE deterministic size
    * (md5-smallest 300 doc_ids) — a %-of-corpus sample grows linearly
    * and turns the same-source pair join quadratic at scale; 300 docs
    * bound the pair count (≤ ~45k) no matter the corpus size, and the
    * estimator-quality statistics need no more than that.
    *
    * Pair-join payload is kept COMPACT: the exact |A∩B| per pair comes
    * from an exploded (source, shingle-hash) self-join + count (the q24
    * shape — only docs actually sharing a hash ever pair there), LEFT-
    * joined back onto the all-same-source-pairs frame, which carries
    * just (nx, 16-slot sig) per side. The earlier form hauled both full
    * hx arrays through all ~45k pairs and intersected per pair — 44 s
    * under memory pressure in the r6 driver bench; this shape moves
    * each shingle hash once and keeps the per-pair work at a 16-slot
    * zip. */
  private def q288(s: SparkSession, dir: String): DataFrame = {
    val P = graft.functions.expressions.MinHashSignature.P
    val K = 16
    // 300 rows with shingle-hash arrays — tiny; materialized once
    // because both the compact-sig branch and the explode branch read it
    val base = Tables(s, dir)("documents")
      .filter(pmod(col("doc_id"), lit(10)) === 0 && length(col("text")) >= 5)
      .orderBy(md5(encode(col("doc_id").cast("string"), "UTF-8")))
      .limit(300)
      .select(col("doc_id"), col("source"),
        array_distinct(transform(
          graft.functions.TextFunctions.charShingles(col("text"), 5),
          sh => pmod(mdHash(sh), lit(P)))).as("hx"))
      .localCheckpoint()
    val sig = array((0 until K).map { i =>
      val (a, b) = graft.functions.expressions.MinHashSignature.coef(i)
      array_min(transform(col("hx"), x => pmod(lit(a) * x + lit(b), lit(P))))
    }: _*)
    val sigs = base.select(col("doc_id"), col("source"),
      size(col("hx")).as("nx"), sig.as("sig"))
    // exact |A∩B| via exploded hash equi-join: hx is distinct per doc,
    // so the per-(id_a, id_b) match count IS the intersection size
    val ex = base.select(col("doc_id"), col("source"), explode(col("hx")).as("h"))
    val interCnt = ex.as("a").join(ex.as("b"),
        col("a.source") === col("b.source") && col("a.h") === col("b.h")
          && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    // all same-source pairs (zero-overlap pairs included — they land in
    // bucket 0 with exact = 0), compact payload only
    val inter = coalesce(col("inter"), lit(0L))
    val pairs = sigs.as("a").join(sigs.as("b"),
        col("a.source") === col("b.source")
          && col("a.doc_id") < col("b.doc_id"))
      .join(interCnt,
        col("a.doc_id") === col("id_a") && col("b.doc_id") === col("id_b"),
        "left")
      .select(
        (size(filter(zip_with(col("a.sig"), col("b.sig"),
          (x, y) => x === y), b => b)).cast("double") / K).as("est"),
        (inter.cast("double")
          / (col("a.nx") + col("b.nx") - inter)).as("exact"))
    pairs
      .withColumn("bucket",
        least(floor(col("exact") * 10).cast("int"), lit(9)))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_pairs"),
        round(avg(abs(col("est") - col("exact"))), 4).as("mean_abs_err"),
        round(avg(col("est") - col("exact")), 4).as("mean_bias"))
      .select(col("bucket").cast("long").as("bucket"),
        col("n_pairs").cast("long").as("n_pairs"),
        col("mean_abs_err"), col("mean_bias"))
      .orderBy("bucket")
  }

  private val q288Sql = {
    val P = graft.functions.expressions.MinHashSignature.P
    val K = 16
    val sigList = (0 until K)
      .map { i =>
        val (a, b) = graft.functions.expressions.MinHashSignature.coef(i)
        s"list_min(list_transform(hx, x -> ($a * x + $b) % $P))"
      }
      .mkString("[", ", ", "]")
    val agree = (1 to K)
      .map(i => s"CASE WHEN a.sig[$i] = b.sig[$i] THEN 1 ELSE 0 END")
      .mkString(" + ")
    s"""WITH d AS (
         SELECT doc_id, source,
           list_distinct(list_transform(
             list_distinct(list_transform(generate_series(1, length(text) - 4),
               i -> substring(text, i, 5))),
             s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % $P)) AS hx
         FROM documents WHERE doc_id % 10 = 0 AND length(text) >= 5
         ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 300),
       sigs AS (SELECT doc_id, source, hx, len(hx) AS nx, $sigList AS sig
              FROM d),
       pairs AS (
         SELECT ($agree) / ${K}.0 AS est,
           CAST(len(list_intersect(a.hx, b.hx)) AS DOUBLE)
             / (a.nx + b.nx - len(list_intersect(a.hx, b.hx))) AS exact
         FROM sigs a JOIN sigs b
           ON a.source = b.source AND a.doc_id < b.doc_id)
       SELECT CAST(least(CAST(floor(exact * 10) AS INT), 9) AS BIGINT) AS bucket,
              CAST(count(*) AS BIGINT) AS n_pairs,
              round(avg(abs(est - exact)), 4) AS mean_abs_err,
              round(avg(est - exact), 4) AS mean_bias
       FROM pairs GROUP BY 1 ORDER BY 1"""
  }

  override def queries: Map[String, QueryFn] = Map(
    "q283_price_index"   -> q283 _,
    "q284_js_divergence" -> q284 _,
    "q285_ewma"          -> q285 _,
    "q286_jackknife"     -> q286 _,
    "q287_poisson_fit"   -> q287 _,
    "q288_minhash_error" -> q288 _)

  override def oracles: Map[String, String] = Map(
    "q283_price_index"   -> q283Sql,
    "q284_js_divergence" -> q284Sql,
    "q285_ewma"          -> q285Sql,
    "q286_jackknife"     -> q286Sql,
    "q287_poisson_fit"   -> q287Sql,
    "q288_minhash_error" -> q288Sql)
}
