package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Anonymize, HashSampleQuantiles, KmvDistinct, SubstringDedup}

/** Round-7 pack: exact-substring (suffix-array-criterion) dedup — the
  * one training-data dedup mode the engine did not yet expose next to
  * exact/MinHash/SimHash/semantic/line-level. All three queries drive
  * [[graft.operators.SubstringDedup]] with the md5-prefix gram key so
  * DuckDB can recompute them bit-for-bit; the xxhash64 production key
  * is pinned equal-shape by SubstringDedupSpec.
  */
object Extras54 extends QueryPack {

  private val K = 8

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("documents")

  /** Shared oracle CTE prefix: tokenize → gram keys → duplicated grams
    * → per-doc maximal spans, mirroring SubstringDedup.spans exactly
    * (same tokenizer as the q300 family; same md5-prefix gram key; the
    * p2−p1≤k window chaining is the interval union — see the operator
    * scaladoc for the proof). */
  private val spansCte =
    s"""WITH toks AS (
         SELECT doc_id, source,
                list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '') AS t
         FROM documents),
       grams AS (
         SELECT doc_id, i AS pos,
                substring(md5(array_to_string(t[i + 1:i + $K], ' ')), 1, 16)
                  AS gram
         FROM toks, unnest(generate_series(0, len(t) - $K)) AS u(i)
         WHERE len(t) >= $K),
       dup AS (SELECT gram FROM grams GROUP BY gram HAVING count(*) >= 2),
       hits AS (SELECT doc_id, pos FROM grams JOIN dup USING (gram)),
       marked AS (
         SELECT doc_id, pos,
                CASE WHEN pos - lag(pos) OVER
                       (PARTITION BY doc_id ORDER BY pos) <= $K
                     THEN 0 ELSE 1 END AS newrun
         FROM hits),
       runs AS (
         SELECT doc_id, pos,
                sum(newrun) OVER (PARTITION BY doc_id ORDER BY pos) AS run
         FROM marked),
       spans AS (
         SELECT doc_id, min(pos) AS start_tok,
                max(pos) + ($K - 1) AS end_tok,
                max(pos) + ($K - 1) - min(pos) + 1 AS span_toks
         FROM runs GROUP BY doc_id, run)"""

  // --------------------------------------------------------------- q348
  /** Per-document duplicated-substring profile: maximal duplicated-span
    * count, duplicated token mass, and duplicated fraction. The 100 TB
    * shape is two gram-key shuffles (dedup-count + back-join) over a
    * ~24-byte-per-token relation — never the text — then one per-doc
    * window pass; see SubstringDedup scaladoc. */
  private def q348(s: SparkSession, dir: String): DataFrame =
    SubstringDedup.profile(docs(s, dir), "doc_id", "text", K)
      .select(col("doc_id"),
        col("n_spans").cast("long").as("n_spans"),
        col("dup_toks").cast("long").as("dup_toks"),
        col("n_toks").cast("long").as("n_toks"),
        col("dup_frac"))
      .orderBy("doc_id")

  private val q348Sql =
    s"""$spansCte,
       ntok AS (SELECT doc_id, len(t) AS n_toks FROM toks)
       SELECT doc_id,
              CAST(count(*) AS BIGINT) AS n_spans,
              CAST(sum(span_toks) AS BIGINT) AS dup_toks,
              CAST(any_value(n_toks) AS BIGINT) AS n_toks,
              round(CAST(sum(span_toks) AS DOUBLE) / any_value(n_toks), 6)
                AS dup_frac
       FROM spans JOIN ntok USING (doc_id)
       GROUP BY doc_id ORDER BY doc_id"""

  // --------------------------------------------------------------- q349
  /** Top-20 longest maximal duplicated spans corpus-wide — the audit
    * view an operator of the dedup pipeline looks at first. Total order
    * (span desc, doc, start) so the limit boundary is deterministic. */
  private def q349(s: SparkSession, dir: String): DataFrame =
    SubstringDedup.spans(docs(s, dir), "doc_id", "text", K)
      .select(col("doc_id"),
        col("start_tok").cast("long").as("start_tok"),
        col("end_tok").cast("long").as("end_tok"),
        col("span_toks").cast("long").as("span_toks"))
      .orderBy(col("span_toks").desc, col("doc_id"), col("start_tok"))
      .limit(20)

  private val q349Sql =
    s"""$spansCte
       SELECT doc_id,
              CAST(start_tok AS BIGINT) AS start_tok,
              CAST(end_tok AS BIGINT) AS end_tok,
              CAST(span_toks AS BIGINT) AS span_toks
       FROM spans
       ORDER BY span_toks DESC, doc_id, start_tok LIMIT 20"""

  // --------------------------------------------------------------- q350
  /** Per-source retention if every duplicated span were cut (the Lee et
    * al. removal policy): token mass before/after and the kept
    * fraction. Docs without spans retain everything — hence the left
    * join against the narrow per-doc token counts. */
  private def q350(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val nTok = d.select(col("source"), col("doc_id"),
      size(SubstringDedup.tokens(col("text"))).as("n_toks"))
    val dup = SubstringDedup.spans(d, "doc_id", "text", K)
      .groupBy("doc_id").agg(sum("span_toks").as("dup_toks"))
    nTok.join(dup, Seq("doc_id"), "left")
      .na.fill(0L, Seq("dup_toks"))
      .groupBy("source")
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("n_toks").cast("long").as("toks_before"),
        (sum("n_toks") - sum("dup_toks")).cast("long").as("toks_after"))
      .withColumn("retention",
        round(col("toks_after").cast("double") / col("toks_before"), 6))
      .orderBy("source")
  }

  private val q350Sql =
    s"""$spansCte,
       dupdoc AS (
         SELECT doc_id, sum(span_toks) AS dup_toks FROM spans GROUP BY 1),
       per_doc AS (
         SELECT source, len(t) AS n_toks,
                coalesce(dup_toks, 0) AS dup_toks
         FROM toks LEFT JOIN dupdoc USING (doc_id))
       SELECT source,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_toks) AS BIGINT) AS toks_before,
              CAST(sum(n_toks) - sum(dup_toks) AS BIGINT) AS toks_after,
              round(CAST(sum(n_toks) - sum(dup_toks) AS DOUBLE)
                / sum(n_toks), 6) AS retention
       FROM per_doc GROUP BY source ORDER BY source"""

  // --------------------------------------------------------------- q351
  /** Deterministic quantile-sketch audit: bottom-k hash-sample
    * estimates (the order-independent mergeable sketch — see
    * [[graft.operators.HashSampleQuantiles]] for why GK/approx_percentile
    * cannot be value-pinned) vs the exact percentiles, with each
    * estimate's EXACT rank recomputed over the full column so the
    * output certifies its own error: abs_rank_err stays inside the
    * DKW-style 0.05 band for k=1024. At 100 TB only the sketch side
    * runs (per-partition top-k heaps + k-row merge); the exact side is
    * the audit-only truth. */
  private val qList = Seq(0.01, 0.25, 0.5, 0.75, 0.99)
  private val sampleK = 1024

  private def q351(s: SparkSession, dir: String): DataFrame = {
    // Spread-guarded, projected first (guide §2.3/§2.5): the sample
    // heaps, the exact-percentile buffer, and the 5× rank cross all
    // otherwise run in ONE task on a single-row-group scan
    val li = graft.operators.Spread.byKey(
      Tables(s, dir)("lineitem")
        .select("l_orderkey", "l_linenumber", "l_extendedprice"),
      col("l_orderkey"))
    val sample = HashSampleQuantiles.bottomKSample(li,
      col("l_extendedprice"),
      concat_ws("-", col("l_orderkey"), col("l_linenumber")), sampleK)
    val est = HashSampleQuantiles.sampleQuantiles(sample, sampleK, qList)
    val exact = li
      .agg(expr(s"percentile(l_extendedprice, array(${qList.map(q => s"${q}D").mkString(", ")}))")
        .as("ps"))
      .select(posexplode(col("ps")).as(Seq("i", "exact_p")))
      .withColumn("q", element_at(array(qList.map(lit): _*), col("i") + 1))
      .select("q", "exact_p")
    val rank = li.select(col("l_extendedprice").as("p"))
      .crossJoin(broadcast(est))
      .groupBy("q", "est_p")
      .agg((sum(when(col("p") <= col("est_p"), 1).otherwise(0)).cast("double")
        / count(lit(1))).as("rank_frac"))
    rank.join(broadcast(exact), Seq("q"))
      .select(col("q"),
        round(col("est_p"), 2).as("est_p"),
        round(col("exact_p"), 4).as("exact_p"),
        round(col("rank_frac"), 6).as("rank_frac"),
        round(abs(col("rank_frac") - col("q")), 6).as("abs_rank_err"),
        when(abs(col("rank_frac") - col("q")) <= 0.05, 1).otherwise(0)
          .cast("int").as("within_bound"))
      .orderBy("q")
  }

  private val q351Sql = {
    val qsSql = qList.map(q => s"$q").mkString(", ")
    val targets = qList
      .map(q => s"($q, ${math.ceil(q * sampleK).toInt})").mkString(", ")
    s"""WITH li AS (
         SELECT l_extendedprice AS p,
                md5(CAST(l_orderkey AS VARCHAR) || '-' ||
                    CAST(l_linenumber AS VARCHAR)) AS h
         FROM lineitem),
       samp AS (SELECT p AS v FROM li ORDER BY h, p LIMIT $sampleK),
       ranked AS (SELECT v, row_number() OVER (ORDER BY v) AS r FROM samp),
       qs AS (SELECT * FROM (VALUES $targets) AS t(q, rk)),
       est AS (SELECT q, v AS est_p FROM ranked JOIN qs ON r = rk),
       ex AS (SELECT quantile_cont(p, [$qsSql]) AS ps FROM li),
       exact AS (
         SELECT [$qsSql][i] AS q, ps[i] AS exact_p
         FROM ex, unnest(generate_series(1, ${qList.size})) AS t(i)),
       rnk AS (
         SELECT q, est_p,
                CAST(sum(CASE WHEN li.p <= est_p THEN 1 ELSE 0 END)
                  AS DOUBLE) / count(*) AS rank_frac
         FROM li CROSS JOIN est GROUP BY q, est_p)
       SELECT q, round(est_p, 2) AS est_p,
              round(exact_p, 4) AS exact_p,
              round(rank_frac, 6) AS rank_frac,
              round(abs(rank_frac - q), 6) AS abs_rank_err,
              CAST(CASE WHEN abs(rank_frac - q) <= 0.05 THEN 1 ELSE 0 END
                AS INT) AS within_bound
       FROM rnk JOIN exact USING (q) ORDER BY q"""
  }

  // --------------------------------------------------------------- q352
  /** Streaming near-dup gate: the ingestion-time MinHash shape — static
    * corpus distilled once into signatures + banded keys, each arriving
    * micro-batch probes it with two broadcast stream-static joins (see
    * [[graft.streaming.StreamNearDup]]). md5 family end-to-end, so the
    * DuckDB oracle replays the flagged pair set exactly. */
  private def q352(s: SparkSession, dir: String): DataFrame =
    graft.streaming.StreamNearDup
      .gateToMemory(s, dir, queryName = "q352_gate_out")
      .withColumn("est_jaccard", round(col("est_jaccard"), 6))
      .orderBy("in_id", "idx_id")

  private val q352Sql = {
    import graft.functions.expressions.MinHashSignature
    val P = MinHashSignature.P
    val sigList = (0 until 16)
      .map { i =>
        val (a, b) = MinHashSignature.coef(i)
        s"list_min(list_transform(hx, x -> ($a * x + $b) % $P))"
      }
      .mkString("[", ", ", "]")
    val agree = (1 to 16)
      .map(i => s"CASE WHEN sig_a[$i] = sig_b[$i] THEN 1 ELSE 0 END")
      .mkString(" + ")
    val bandKey = (1 to 4)
      .map(j => s"sig[4 * t.b + $j]::VARCHAR")
      .mkString(" || ',' || ")
    s"""WITH d AS (
         SELECT doc_id,
           list_transform(
             list_distinct(list_transform(generate_series(1, length(text) - 4),
               i -> substring(text, i, 5))),
             s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % $P) AS hx
         FROM documents WHERE doc_id % 5 = 0 AND length(text) >= 5),
       sigs AS (SELECT doc_id, $sigList AS sig FROM d),
       bands AS (
         SELECT doc_id, sig, t.b AS band_idx, $bandKey AS band_key
         FROM sigs, unnest(generate_series(0, 3)) AS t(b)),
       pairs AS (
         SELECT DISTINCT a.doc_id AS in_id, b.doc_id AS idx_id,
           a.sig AS sig_a, b.sig AS sig_b
         FROM bands a JOIN bands b
           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         WHERE a.doc_id % 10 = 5 AND b.doc_id % 10 = 0),
       est AS (SELECT in_id, idx_id, ($agree) / 16.0 AS e FROM pairs)
       SELECT in_id, idx_id, round(e, 6) AS est_jaccard
       FROM est WHERE e >= 0.2 ORDER BY in_id, idx_id"""
  }

  // --------------------------------------------------------------- q353
  /** k-anonymity audit + suppression over customer quasi-identifiers
    * (nation, market segment, account-balance k$-bucket): per nation,
    * how many rows sit in groups smaller than k=5 and how many survive
    * suppression. One shuffle on the qid; the at-risk group list is the
    * tail of the group-size distribution, so the suppression anti-join
    * broadcasts (see [[graft.operators.Anonymize]]). */
  private def q353(s: SparkSession, dir: String): DataFrame = {
    val qids = Seq("c_nationkey", "c_mktsegment", "bal_kb")
    val c = Tables(s, dir)("customer")
      .withColumn("bal_kb", floor(col("c_acctbal") / 1000))
    val prof = Anonymize.kAnonymityProfile(c, qids, 5)
    val byNation = prof.groupBy("c_nationkey")
      .agg(sum("group_n").cast("long").as("n_rows"),
        count(lit(1)).cast("long").as("n_groups"),
        sum("at_risk").cast("long").as("risk_groups"),
        sum(when(col("at_risk") === 1, col("group_n")).otherwise(0L))
          .cast("long").as("risk_rows"))
    val released = Anonymize
      .kSuppressGroups(c, qids, prof.filter(col("at_risk") === 1))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).cast("long").as("released_rows"))
    byNation.join(released, Seq("c_nationkey"), "left")
      .na.fill(0L, Seq("released_rows"))
      .withColumn("risk_share",
        round(col("risk_rows").cast("double") / col("n_rows"), 6))
      .orderBy("c_nationkey")
  }

  private val q353Sql =
    """WITH c AS (
         SELECT c_nationkey, c_mktsegment,
                CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_kb
         FROM customer),
       prof AS (
         SELECT c_nationkey, c_mktsegment, bal_kb,
                count(*) AS group_n,
                CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS at_risk
         FROM c GROUP BY 1, 2, 3),
       by_nation AS (
         SELECT c_nationkey,
                CAST(sum(group_n) AS BIGINT) AS n_rows,
                CAST(count(*) AS BIGINT) AS n_groups,
                CAST(sum(at_risk) AS BIGINT) AS risk_groups,
                CAST(sum(CASE WHEN at_risk = 1 THEN group_n ELSE 0 END)
                  AS BIGINT) AS risk_rows
         FROM prof GROUP BY 1)
       SELECT c_nationkey, n_rows, n_groups, risk_groups, risk_rows,
              CAST(n_rows - risk_rows AS BIGINT) AS released_rows,
              round(CAST(risk_rows AS DOUBLE) / n_rows, 6) AS risk_share
       FROM by_nation ORDER BY c_nationkey"""

  // --------------------------------------------------------------- q354
  /** Deterministic ε-DP count release per nation: Laplace(1/ε) noise
    * from an md5-uniform inverse CDF, so the published statistic is
    * auditable (same key + salt → same release; the oracle replays the
    * noise bit-for-bit). ε=0.5, salt "r7". */
  private def q354(s: SparkSession, dir: String): DataFrame =
    Anonymize.dpCounts(Tables(s, dir)("customer"), "c_nationkey",
        epsilon = 0.5, salt = "r7")
      .withColumn("noise",
        round(Anonymize.laplaceNoise(col("c_nationkey"), "r7", 2.0), 6))
      .select(col("c_nationkey"), col("true_n").cast("long").as("true_n"),
        col("released_n"), col("noise"))
      .orderBy("c_nationkey")

  private val q354Sql =
    """WITH g AS (
         SELECT c_nationkey, count(*) AS true_n FROM customer GROUP BY 1),
       u AS (
         SELECT c_nationkey, true_n,
                ('0x' || substr(md5(CAST(c_nationkey AS VARCHAR) || '-r7'),
                  1, 8))::BIGINT / 4294967296.0 - 0.5 AS uc
         FROM g),
       n AS (
         SELECT c_nationkey, true_n,
                -2.0 * (CASE WHEN uc >= 0 THEN 1.0 ELSE -1.0 END)
                  * ln(greatest(1.0 - 2.0 * abs(uc),
                                1.0 / 4294967296.0)) AS noise
         FROM u)
       SELECT c_nationkey, CAST(true_n AS BIGINT) AS true_n,
              greatest(0, CAST(round(true_n + noise, 0) AS BIGINT))
                AS released_n,
              round(noise, 6) AS noise
       FROM n ORDER BY c_nationkey"""

  // --------------------------------------------------------------- q355
  /** Right-to-be-forgotten cascade audit: a deterministic deletion
    * request list (md5 1/256 sample of customers — request lists are
    * small by nature, hence the explicit broadcast) cascades through
    * the FK chain customer → orders → lineitem; the audit reports rows
    * touched per table. The order-key list derived mid-cascade is NOT
    * broadcast-hinted: at 100 TB it is 1/256 of orders, so AQE picks
    * shuffle-vs-broadcast from its runtime size. */
  private def q355(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    val delFlagC =
      substring(md5(concat_ws("-", col("c_custkey"), lit("gdpr"))), 1, 2) === "00"
    val c = t("customer").withColumn("del", delFlagC)
    // distinct: the synthetic tables do not enforce PKs (duplicate keys
    // would multiply rows through the left joins; IN-semantics don't)
    val delCust = c.filter(col("del")).select(col("c_custkey").as("k"))
      .distinct()
    val o = t("orders")
      .join(broadcast(delCust), col("o_custkey") === col("k"), "left")
      .withColumn("del", col("k").isNotNull)
    val delOrd = o.filter(col("del")).select(col("o_orderkey").as("k2"))
      .distinct()
    val l = t("lineitem")
      .join(delOrd, col("l_orderkey") === col("k2"), "left")
      .withColumn("del", col("k2").isNotNull)
    def stat(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).cast("long").as("n_rows"),
          sum(when(col("del"), 1L).otherwise(0L)).cast("long").as("n_deleted"))
        .withColumn("tbl", lit(name))
    stat("customer", c).unionByName(stat("orders", o))
      .unionByName(stat("lineitem", l))
      .select(col("tbl"), col("n_rows"), col("n_deleted"),
        round(col("n_deleted").cast("double") / col("n_rows"), 6)
          .as("del_share"))
      .orderBy("tbl")
  }

  private val q355Sql =
    """WITH delc AS (
         SELECT c_custkey FROM customer
         WHERE substr(md5(CAST(c_custkey AS VARCHAR) || '-gdpr'), 1, 2) = '00'),
       delo AS (
         SELECT o_orderkey FROM orders
         WHERE o_custkey IN (SELECT c_custkey FROM delc)),
       stats AS (
         SELECT 'customer' AS tbl,
                (SELECT count(*) FROM customer) AS n_rows,
                (SELECT count(*) FROM delc) AS n_deleted
         UNION ALL
         SELECT 'lineitem',
                (SELECT count(*) FROM lineitem),
                (SELECT count(*) FROM lineitem
                 WHERE l_orderkey IN (SELECT o_orderkey FROM delo))
         UNION ALL
         SELECT 'orders',
                (SELECT count(*) FROM orders),
                (SELECT count(*) FROM delo))
       SELECT tbl, CAST(n_rows AS BIGINT) AS n_rows,
              CAST(n_deleted AS BIGINT) AS n_deleted,
              round(CAST(n_deleted AS DOUBLE) / n_rows, 6) AS del_share
       FROM stats ORDER BY tbl"""

  // --------------------------------------------------------------- q356
  /** KMV distinct-count audit: the deterministic cardinality sketch
    * ((k−1)/h(k) over md5-uniform hashes, exact below k) vs the true
    * distinct count per return flag — completing the oracle-replayable
    * sketch ladder (CMS q325 / quantiles q351 / MinHash q26 / KMV here)
    * next to the unpinnable built-ins (HLL q39, GK). */
  private def q356(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir)("lineitem")
    val est = KmvDistinct.estimate(li, "l_returnflag", col("l_partkey"),
      k = 256, salt = "kmv")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("exact_distinct"))
    est.join(exact, "l_returnflag")
      .select(col("l_returnflag"),
        col("exact_distinct").cast("long").as("exact_distinct"),
        round(col("est_distinct"), 4).as("est_distinct"),
        round(abs(col("est_distinct") - col("exact_distinct"))
          / col("exact_distinct"), 6).as("rel_err"))
      .orderBy("l_returnflag")
  }

  private val q356Sql =
    """WITH d AS (
         SELECT DISTINCT l_returnflag AS g, l_partkey AS v FROM lineitem),
       h AS (
         SELECT g, ('0x' || substr(md5(CAST(v AS VARCHAR) || '-kmv'), 1, 8))
                  ::BIGINT / 4294967296.0 AS h
         FROM d),
       r AS (SELECT g, h,
                    row_number() OVER (PARTITION BY g ORDER BY h) AS r
             FROM h),
       kk AS (
         SELECT g, count(*) AS n_kept,
                max(CASE WHEN r = 256 THEN h END) AS hk
         FROM r WHERE r <= 256 GROUP BY g),
       est AS (
         SELECT g, CASE WHEN n_kept < 256 THEN CAST(n_kept AS DOUBLE)
                        ELSE 255.0 / hk END AS est
         FROM kk),
       ex AS (
         SELECT l_returnflag AS g, count(DISTINCT l_partkey) AS exact_distinct
         FROM lineitem GROUP BY 1)
       SELECT g AS l_returnflag,
              CAST(exact_distinct AS BIGINT) AS exact_distinct,
              round(est, 4) AS est_distinct,
              round(abs(est - exact_distinct) / exact_distinct, 6) AS rel_err
       FROM est JOIN ex USING (g) ORDER BY l_returnflag"""

  // --------------------------------------------------------------- q357
  /** Corpus datasheet ("Datasheets for Datasets"-style release table):
    * per source — volume (docs, tokens), language spread (distinct +
    * modal language), exact-dup rate (content-fingerprint), and length
    * stats (mean chars, exact median). One grouped aggregate over the
    * corpus plus a (source, lang) count for the modal language; every
    * signal is the per-source rollup of an operator the engine already
    * oracles individually. */
  private def q357(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val base = d.groupBy("source").agg(
      count(lit(1)).cast("long").as("n_docs"),
      sum(size(SubstringDedup.tokens(col("text")))).cast("long")
        .as("total_tokens"),
      countDistinct(col("lang")).cast("long").as("n_langs"),
      round((count(lit(1)) - countDistinct(md5(col("text"))))
        .cast("double") / count(lit(1)), 6).as("exact_dup_rate"),
      round(avg(col("n_chars")), 2).as("mean_chars"),
      round(expr("percentile(n_chars, 0.5D)"), 1).as("median_chars"))
    val wTop = Window.partitionBy("source")
      .orderBy(col("n").desc, col("lang"))
    val topLang = d.groupBy("source", "lang")
      .agg(count(lit(1)).as("n"))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") === 1)
      .select(col("source"), col("lang").as("top_lang"))
    base.join(topLang, "source").orderBy("source")
  }

  private val q357Sql =
    """WITH base AS (
         SELECT source,
                CAST(count(*) AS BIGINT) AS n_docs,
                CAST(sum(len(list_filter(
                  regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> ''))) AS BIGINT) AS total_tokens,
                CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
                round(CAST(count(*) - count(DISTINCT md5(text)) AS DOUBLE)
                  / count(*), 6) AS exact_dup_rate,
                round(avg(n_chars), 2) AS mean_chars,
                round(quantile_cont(n_chars, 0.5), 1) AS median_chars
         FROM documents GROUP BY source),
       lc AS (
         SELECT source, lang, count(*) AS n,
                row_number() OVER (PARTITION BY source
                                   ORDER BY count(*) DESC, lang) AS rk
         FROM documents GROUP BY source, lang)
       SELECT b.*, lc.lang AS top_lang
       FROM base b JOIN lc ON b.source = lc.source AND lc.rk = 1
       ORDER BY b.source"""

  // --------------------------------------------------------------- q391
  /** Span SCRUBBING — the transform half of the Lee et al. pipeline
    * (delete the duplicated substrings, keep the documents): every
    * token covered by a q348-family maximal span is removed and the
    * remainder re-joins with single spaces. Emits every doc (span-free
    * docs pass through untouched), so both the surgery and the
    * pass-through contract are driver-checked. sf0.01 output carries
    * ~500 full scrubbed texts — the deliberate price of value-checking
    * actual text surgery rather than just counts. */
  private def q391(s: SparkSession, dir: String): DataFrame =
    SubstringDedup.scrub(docs(s, dir), "doc_id", "text", K)
      .select(col("doc_id"), col("n_toks"), col("kept_toks"),
        col("scrubbed"))
      .orderBy("doc_id")

  private val q391Sql =
    s"""$spansCte,
       dropped AS (
         SELECT doc_id, unnest(generate_series(start_tok, end_tok)) AS p
         FROM spans),
       keep AS (
         SELECT toks.doc_id, u.i - 1 AS p, t[u.i] AS w
         FROM toks, unnest(generate_series(1, len(t))) AS u(i)
         WHERE NOT EXISTS (
           SELECT 1 FROM dropped
           WHERE dropped.doc_id = toks.doc_id AND dropped.p = u.i - 1))
       SELECT toks.doc_id,
              CAST(len(t) AS INT) AS n_toks,
              CAST(count(k.p) AS INT) AS kept_toks,
              coalesce(string_agg(k.w, ' ' ORDER BY k.p), '') AS scrubbed
       FROM toks LEFT JOIN keep k ON k.doc_id = toks.doc_id
       GROUP BY toks.doc_id, len(t) ORDER BY toks.doc_id"""

  override def queries: Map[String, QueryFn] = Map(
    "q391_substring_scrub"     -> q391 _,
    "q348_substring_profile"   -> q348 _,
    "q349_substring_topspans"  -> q349 _,
    "q350_substring_retention" -> q350 _,
    "q351_quantile_sketch"     -> q351 _,
    "q352_stream_neardup"      -> q352 _,
    "q353_k_anonymity"         -> q353 _,
    "q354_dp_release"          -> q354 _,
    "q355_deletion_cascade"    -> q355 _,
    "q356_kmv_distinct"        -> q356 _,
    "q357_corpus_datasheet"    -> q357 _)

  override def oracles: Map[String, String] = Map(
    "q391_substring_scrub"     -> q391Sql,
    "q348_substring_profile"   -> q348Sql,
    "q349_substring_topspans"  -> q349Sql,
    "q350_substring_retention" -> q350Sql,
    "q351_quantile_sketch"     -> q351Sql,
    "q352_stream_neardup"      -> q352Sql,
    "q353_k_anonymity"         -> q353Sql,
    "q354_dp_release"          -> q354Sql,
    "q355_deletion_cascade"    -> q355Sql,
    "q356_kmv_distinct"        -> q356Sql,
    "q357_corpus_datasheet"    -> q357Sql)
}
