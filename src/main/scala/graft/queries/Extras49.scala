package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 45: near-dup economics (edit distance, LSH
  * parameter sweeps), heavy-tail fitting, value banding, one-sample
  * distribution testing, and engagement stickiness.
  *
  * Numeric rules as ever: integer logic everywhere it exists
  * (levenshtein, band matches, DAU/MAU, value bands), ln only behind
  * the round(5) precedent (Hill estimator), and supremum statistics
  * over engine-identical doubles (KS). */
object Extras49 extends QueryPack {

  /** md5-derived int64 (q43 family) — identical in DuckDB. */
  private def mdHash(s: Column): Column =
    conv(substring(md5(encode(s, "UTF-8")), 1, 8), 16, 10).cast("long")

  // --------------------------------------------------------------- q313
  /** Adjacent-neighbor edit distance: docs sorted by (truncated) text
    * put near-identical strings side by side; levenshtein on the
    * 80-char prefix of each adjacent pair is an integer, and its
    * per-source distribution separates templated sources from organic
    * ones. Sort-adjacency is the O(n log n) stand-in for the O(n²)
    * all-pairs matrix — the same trick bulk dedup uses before a
    * verifier pass.
    *
    * The global order comes from [[graft.operators.RowIndexer]]
    * (range shuffle + local sort + partition-offset stamp), NOT
    * `lag() OVER (ORDER BY ...)` — an empty-partitionSpec window
    * funnels the whole document grain through ONE task, the exact
    * 100 TB killer Curriculum.scala pins against. Adjacency is then a
    * distributed equi-join of row i against row i−1 on the stamped
    * index; the oracle keeps the relational lag() form (same total
    * order, same integers). */
  private def q313(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RowIndexer
    val d = Tables(s, dir)("documents")
    val pre = d.select(col("source"), col("doc_id"),
      substring(col("text"), 1, 80).as("p"))
    // both join legs read the index: materialize the slim
    // (source, p, idx) frame once instead of re-running the range
    // shuffle + zipWithIndex lineage per leg
    val idxd = RowIndexer.stableIndex(pre, Seq(col("p"), col("doc_id")))
      .select(col("source"), col("p"), col("idx"))
      .localCheckpoint()
    val prv = idxd.select(col("p").as("prev"), (col("idx") + 1).as("idx"))
    idxd.join(prv, "idx") // inner join: idx 0 has no predecessor
      .select(col("source"), levenshtein(col("p"), col("prev")).as("d"))
      .groupBy("source")
      .agg(count(lit(1)).as("n"),
        min("d").as("min_d"),
        sum("d").as("sum_d"),
        sum(when(col("d") <= 5, 1L).otherwise(0L)).as("near"))
      .select(col("source"), col("n").cast("long").as("n"),
        col("min_d").cast("long").as("min_dist"),
        round(col("sum_d").cast("double") / col("n"), 4).as("avg_dist"),
        round(col("near").cast("double") / col("n"), 5)
          .as("near_dup_share"))
      .orderBy("source")
  }

  private val q313Sql =
    """WITH pre AS (
         SELECT source, doc_id, substring(text, 1, 80) AS p
         FROM documents),
       adj AS (
         SELECT source,
                levenshtein(p, lag(p) OVER (ORDER BY p, doc_id)) AS d
         FROM pre)
       SELECT source, CAST(count(*) AS BIGINT) AS n,
              CAST(min(d) AS BIGINT) AS min_dist,
              round(CAST(sum(d) AS DOUBLE) / count(*), 4) AS avg_dist,
              round(CAST(sum(CASE WHEN d <= 5 THEN 1 ELSE 0 END)
                AS DOUBLE) / count(*), 5) AS near_dup_share
       FROM adj WHERE d IS NOT NULL
       GROUP BY source ORDER BY source"""

  // --------------------------------------------------------------- q314
  /** LSH band-parameter sweep: with the 16-permutation q43 signature
    * split into b ∈ {2, 4, 8} bands, count the candidate pairs each
    * banding produces and its precision against exact shingle-hash
    * Jaccard ≥ 0.5 — the table that picks b before a 100 TB dedup
    * run. Candidates come from equi-joins on (band, band-signature);
    * truth is the same integer-ratio Jaccard as q288.
    *
    * Like q288, the sweep samples an ABSOLUTE deterministic 300 docs
    * (md5-smallest doc_ids) instead of a %-of-corpus slice: the b=8
    * banding's candidate count grows superlinearly with sample size,
    * and a parameter-selection table needs a fixed-size probe, not a
    * corpus-proportional one. */
  private def q314(s: SparkSession, dir: String): DataFrame = {
    val P = graft.functions.expressions.MinHashSignature.P
    val K = 16
    // Signatures derived ONCE (fused one-pass k-minima; bit-identical
    // to the array_min∘transform composition) and materialized — the
    // three sweep branches each read them. Band rows stay slim
    // (doc_id, band, bsig): the shingle-hash arrays needed for exact
    // Jaccard verification join back only for DISTINCT candidate
    // pairs, never riding the band exchange (same shape as
    // Dedup.minhashCandidates).
    val sigs = Tables(s, dir)("documents")
      .filter(pmod(col("doc_id"), lit(10)) === 0 && length(col("text")) >= 5)
      .orderBy(md5(encode(col("doc_id").cast("string"), "UTF-8")))
      .limit(300)
      .select(col("doc_id"),
        array_distinct(transform(
          graft.functions.TextFunctions.charShingles(col("text"), 5),
          sh => pmod(mdHash(sh), lit(P)))).as("hx"))
      .select(col("doc_id"), col("hx"), size(col("hx")).as("nx"),
        graft.functions.expressions.MinHashSignature
          .minhashFromHashes(col("hx"), K).as("sig"))
      .localCheckpoint()
    val perB = Seq(2, 4, 8).map { b =>
      val rows = K / b
      val banded = sigs.select(col("doc_id"),
        posexplode(array((0 until b).map(i =>
          concat_ws(",", (0 until rows).map(j =>
            element_at(col("sig"), i * rows + j + 1)): _*)): _*))
          .as(Seq("band", "bsig")))
      val cand = banded.as("a").join(banded.as("b"),
          col("a.band") === col("b.band")
            && col("a.bsig") === col("b.bsig")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("x"), col("b.doc_id").as("y"))
        .distinct()
      cand
        .join(sigs.select(col("doc_id").as("x"), col("hx").as("ahx"),
                          col("nx").as("anx")), "x")
        .join(sigs.select(col("doc_id").as("y"), col("hx").as("bhx"),
                          col("nx").as("bnx")), "y")
        .select((size(array_intersect(col("ahx"), col("bhx")))
          .cast("double")
          / (col("anx") + col("bnx")
            - size(array_intersect(col("ahx"), col("bhx")))))
          .as("jac"))
        .agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(when(col("jac") >= 0.5, 1L).otherwise(0L)),
            lit(0L)).as("n_true"))
        .select(lit(b).as("bands"), col("n_candidates"), col("n_true"))
    }
    perB.reduce(_ unionByName _)
      .select(col("bands").cast("int").as("bands"),
        col("n_candidates").cast("long").as("n_candidates"),
        col("n_true").cast("long").as("n_true"),
        round(col("n_true").cast("double")
          / greatest(col("n_candidates"), lit(1L)), 5).as("precision"))
      .orderBy("bands")
  }

  private val q314Sql = {
    val P = graft.functions.expressions.MinHashSignature.P
    val K = 16
    val sigList = (0 until K)
      .map { i =>
        val (a, b) = graft.functions.expressions.MinHashSignature.coef(i)
        s"list_min(list_transform(hx, x -> ($a * x + $b) % $P))"
      }
      .mkString("[", ", ", "]")
    def bandSel(b: Int): String = {
      val rows = K / b
      val bands = (0 until b).map { i =>
        val parts = (0 until rows)
          .map(j => s"CAST(sig[${i * rows + j + 1}] AS VARCHAR)")
          .mkString(" || ',' || ")
        s"SELECT doc_id, hx, nx, $i AS band, $parts AS bsig FROM sigs"
      }
      bands.mkString("\nUNION ALL\n")
    }
    def sweep(b: Int): String =
      s"""SELECT $b AS bands, count(*) AS n_candidates,
            coalesce(sum(CASE WHEN jac >= 0.5 THEN 1 ELSE 0 END), 0)
              AS n_true
          FROM (
            SELECT DISTINCT a.doc_id AS x, b.doc_id AS y,
              CAST(len(list_intersect(a.hx, b.hx)) AS DOUBLE)
                / (a.nx + b.nx - len(list_intersect(a.hx, b.hx))) AS jac
            FROM band$b a JOIN band$b b
              ON a.band = b.band AND a.bsig = b.bsig
                AND a.doc_id < b.doc_id)"""
    s"""WITH d AS (
         SELECT doc_id,
           list_distinct(list_transform(
             list_distinct(list_transform(generate_series(1, length(text) - 4),
               i -> substring(text, i, 5))),
             s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % $P)) AS hx
         FROM documents WHERE doc_id % 10 = 0 AND length(text) >= 5
         ORDER BY md5(CAST(doc_id AS VARCHAR)) LIMIT 300),
       sigs AS (SELECT doc_id, hx, len(hx) AS nx, $sigList AS sig FROM d),
       band2 AS (${bandSel(2)}),
       band4 AS (${bandSel(4)}),
       band8 AS (${bandSel(8)}),
       u AS (
         ${sweep(2)}
         UNION ALL
         ${sweep(4)}
         UNION ALL
         ${sweep(8)})
       SELECT CAST(bands AS INT) AS bands,
              CAST(n_candidates AS BIGINT) AS n_candidates,
              CAST(n_true AS BIGINT) AS n_true,
              round(CAST(n_true AS DOUBLE)
                / greatest(n_candidates, 1), 5) AS precision
       FROM u ORDER BY bands"""
  }

  // --------------------------------------------------------------- q315
  /** Hill tail-index estimate of the order-value distribution: over
    * the top-k=100 order statistics, α̂ = 1/mean(ln(x_i/x_{k+1})). The
    * ln inputs are exact integer-cents ratios and the 100-term mean
    * sits behind round(5) (entropy-sum precedent); the k+1 threshold
    * is an exact integer picked by row_number. */
  private def q315(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val cents = o.select(floor(col("o_totalprice") * 100 + 0.5).as("c"),
      col("o_orderkey"))
    val w = Window.orderBy(col("c").desc, col("o_orderkey"))
    val ranked = cents.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 101)
    val thresh = ranked.filter(col("rn") === 101)
      .select(col("c").as("xk"))
    ranked.filter(col("rn") <= 100)
      .crossJoin(broadcast(thresh))
      .agg(count(lit(1)).as("k"),
        avg(log(col("c").cast("double") / col("xk"))).as("mean_ln"))
      .select(col("k").cast("long").as("k"),
        round(col("mean_ln"), 5).as("mean_log_excess"),
        round(lit(1.0) / col("mean_ln"), 4).as("hill_alpha"))
  }

  private val q315Sql =
    """WITH cents AS (
         SELECT CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c,
                o_orderkey
         FROM orders),
       ranked AS (
         SELECT c, row_number() OVER (ORDER BY c DESC, o_orderkey) AS rn
         FROM cents),
       thresh AS (SELECT c AS xk FROM ranked WHERE rn = 101),
       top AS (SELECT c FROM ranked WHERE rn <= 100)
       SELECT CAST(count(*) AS BIGINT) AS k,
              round(avg(ln(CAST(c AS DOUBLE) / xk)), 5)
                AS mean_log_excess,
              round(CAST(1 AS DOUBLE) / avg(ln(CAST(c AS DOUBLE) / xk)), 4)
                AS hill_alpha
       FROM top CROSS JOIN thresh"""

  // --------------------------------------------------------------- q316
  /** Revenue mixture by value band (log-decade bins via integer CASE
    * bounds): order counts and exact-cents revenue share per band —
    * where the money actually sits. Pure integers plus two exact
    * ratios. */
  private def q316(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir)("orders")
    val c = floor(col("o_totalprice") * 100 + 0.5)
    val band = when(c < 1000000L, "a_under_10k")
      .when(c < 2000000L, "b_10k_20k")
      .when(c < 3000000L, "c_20k_30k")
      .otherwise("d_over_30k")
    val banded = o.select(band.as("band"), c.as("c"))
      .groupBy("band")
      .agg(count(lit(1)).as("n"), sum("c").as("s"))
    val tot = banded.agg(sum("n").as("tn"), sum("s").as("ts"))
    banded.crossJoin(broadcast(tot))
      .select(col("band"), col("n").cast("long").as("n_orders"),
        round(col("n").cast("double") / col("tn"), 5).as("order_share"),
        round(col("s").cast("double") / col("ts"), 5)
          .as("revenue_share"))
      .orderBy("band")
  }

  private val q316Sql =
    """WITH banded AS (
         SELECT CASE
                  WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                    < 1000000 THEN 'a_under_10k'
                  WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                    < 2000000 THEN 'b_10k_20k'
                  WHEN CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                    < 3000000 THEN 'c_20k_30k'
                  ELSE 'd_over_30k' END AS band,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS c
         FROM orders),
       agg AS (SELECT band, count(*) AS n, sum(c) AS s
               FROM banded GROUP BY 1),
       tot AS (SELECT sum(n) AS tn, sum(s) AS ts FROM agg)
       SELECT band, CAST(n AS BIGINT) AS n_orders,
              round(CAST(n AS DOUBLE) / tn, 5) AS order_share,
              round(CAST(s AS DOUBLE) / ts, 5) AS revenue_share
       FROM agg CROSS JOIN tot ORDER BY band"""

  // --------------------------------------------------------------- q317
  /** One-sample Kolmogorov-Smirnov against Uniform(0, max) for the
    * purchase value column: D = max over the sorted sample of
    * max(i/n − F(v), F(v) − (i−1)/n) with F(v) = v/v_max. Every term
    * derives from exact integers and the raw double v identically in
    * both engines, and the supremum is order-free.
    *
    * The empirical rank i comes from [[graft.operators.RowIndexer]]
    * (range shuffle + partition-offset stamp = idx, so i = idx + 1),
    * NOT `row_number() OVER (ORDER BY ...)` — the global window would
    * sort the whole event grain on one task. The oracle keeps the
    * relational row_number() form: same total order, same ranks. */
  private def q317(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RowIndexer
    val e = Tables(s, dir)("events")
    val v = e.filter(col("event_type") === "purchase")
      .select(col("value").cast("double").as("v"), col("event_id"))
    val tot = v.agg(count(lit(1)).as("n"), max("v").as("vmax"))
    RowIndexer.stableIndex(v, Seq(col("v"), col("event_id")))
      .withColumn("i", col("idx") + 1)
      .crossJoin(broadcast(tot))
      .select(
        greatest(
          col("i").cast("double") / col("n") - col("v") / col("vmax"),
          col("v") / col("vmax")
            - (col("i") - 1).cast("double") / col("n")).as("d"),
        col("n"))
      .agg(max("n").as("n"), max("d").as("ks_d"))
      .select(col("n").cast("long").as("n"),
        round(col("ks_d"), 5).as("ks_d"),
        round(col("ks_d") * sqrt(col("n").cast("double")), 4)
          .as("ks_stat"))
  }

  private val q317Sql =
    """WITH v AS (
         SELECT CAST(value AS DOUBLE) AS v, event_id
         FROM events WHERE event_type = 'purchase'),
       tot AS (SELECT count(*) AS n, max(v) AS vmax FROM v),
       ranked AS (
         SELECT v, row_number() OVER (ORDER BY v, event_id) AS i, n, vmax
         FROM v CROSS JOIN tot),
       d AS (
         SELECT n,
                greatest(CAST(i AS DOUBLE) / n - v / vmax,
                         v / vmax - CAST(i - 1 AS DOUBLE) / n) AS d
         FROM ranked)
       SELECT CAST(any_value(n) AS BIGINT) AS n,
              round(max(d), 5) AS ks_d,
              round(max(d) * sqrt(CAST(any_value(n) AS DOUBLE)), 4)
                AS ks_stat
       FROM d"""

  // --------------------------------------------------------------- q318
  /** Engagement stickiness: per calendar month, avg DAU / MAU — the
    * ratio of two integer reduces over the same user-day grain
    * (completes the q201 rolling-WAU family). */
  private def q318(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
    val ud = e.select(date_trunc("month", col("ts")).as("mo"),
      to_date(col("ts")).as("day"), col("user_id")).distinct()
    val dau = ud.groupBy("mo", "day")
      .agg(countDistinct("user_id").as("dau"))
      .groupBy("mo").agg(sum("dau").as("sum_dau"),
        count(lit(1)).as("n_days"))
    val mau = ud.groupBy("mo").agg(countDistinct("user_id").as("mau"))
    dau.join(mau, "mo")
      .select(col("mo").cast("date").as("month"),
        col("n_days").cast("long").as("n_days"),
        col("mau").cast("long").as("mau"),
        round(col("sum_dau").cast("double") / col("n_days"), 4)
          .as("avg_dau"),
        round(col("sum_dau").cast("double")
          / (col("n_days") * col("mau")), 5).as("stickiness"))
      .orderBy("month")
  }

  private val q318Sql =
    """WITH ud AS (
         SELECT DISTINCT date_trunc('month', ts) AS mo,
                CAST(ts AS DATE) AS day, user_id
         FROM events),
       dau AS (
         SELECT mo, sum(dau) AS sum_dau, count(*) AS n_days FROM (
           SELECT mo, day, count(DISTINCT user_id) AS dau
           FROM ud GROUP BY 1, 2)
         GROUP BY 1),
       mau AS (SELECT mo, count(DISTINCT user_id) AS mau
               FROM ud GROUP BY 1)
       SELECT CAST(dau.mo AS DATE) AS month,
              CAST(n_days AS BIGINT) AS n_days,
              CAST(mau AS BIGINT) AS mau,
              round(CAST(sum_dau AS DOUBLE) / n_days, 4) AS avg_dau,
              round(CAST(sum_dau AS DOUBLE) / (n_days * mau), 5)
                AS stickiness
       FROM dau JOIN mau ON dau.mo = mau.mo ORDER BY month"""

  override def queries: Map[String, QueryFn] = Map(
    "q313_adjacent_edit"  -> q313 _,
    "q314_lsh_band_sweep" -> q314 _,
    "q315_hill_tail"      -> q315 _,
    "q316_value_bands"    -> q316 _,
    "q317_ks_uniform"     -> q317 _,
    "q318_stickiness"     -> q318 _)

  override def oracles: Map[String, String] = Map(
    "q313_adjacent_edit"  -> q313Sql,
    "q314_lsh_band_sweep" -> q314Sql,
    "q315_hill_tail"      -> q315Sql,
    "q316_value_bands"    -> q316Sql,
    "q317_ks_uniform"     -> q317Sql,
    "q318_stickiness"     -> q318Sql)
}
