package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{IvfPq, QualityClassifier, Similarity}

/** Round-13 pack, part 3: closing the loops the round's own audits
  * opened.
  *
  * q483: q477 measured IVF-PQ recall ≈ 0.1-0.3 on the incompressible
  * synthetic vectors and named the lever — exact-vector rerank. This
  * is the lever, audited: [[IvfPq.topKRefined]] (FAISS's refine stage:
  * ADC retrieves a candidate neighborhood, the true vectors order it)
  * under the SAME truth leg, one row per k — read next to q477's rows
  * it shows the recall recovered per exact distance spent.
  * q484: the quality classifier's RELIABILITY table — per score decile,
  * mean predicted score vs observed label rate (Guo et al. 2017's
  * reliability diagram as a relation): the number that says whether
  * "0.8 means 80%" before anyone thresholds or mixes on the score.
  */
object Extras75 extends QueryPack {

  // --------------------------------------------------------------- q483
  /** IVF-PQ + EXACT RERANK RECALL — the q477 audit re-run with the
    * refine stage on (kCandidates = 64 ADC candidates per query, then
    * exact cosine ordering): recall@1/@5 vs the same brute truth over
    * the same absolutely bounded smallest-K md5 sample
    * ([[Extras72.auditSample]]), q472's row shape. The residual miss is
    * bucket pruning alone (a truth neighbor outside every probed
    * bucket is invisible to any rerank) — exactly the decomposition an
    * operator needs to pick nprobe vs kCandidates vs codes.
    *
    * Scale shape: stage 1 is q477's ADC scan unchanged; the rerank
    * adds ONE equi-join of the bounded k_c·|queries| candidate rows
    * (broadcast side) against the corpus scan plus a per-query rank —
    * never brute. Golden-oracled (same fit-dependence as q477). */
  private def q483(s: SparkSession, dir: String): DataFrame = {
    val all = Tables(s, dir)("embeddings")
    val queries = Extras72.auditSample(all)
    val model = IvfPq.fit(all, "vec_id", "embedding",
      dim = 64, coarseK = 8, m = 8, codes = 16, iters = 3)
    val enc = IvfPq.encode(all, "vec_id", "embedding", model)
    val refined = IvfPq.topKRefined(enc, queries, "vec_id", "embedding",
        corpus = all, model = model, k = 5, kCandidates = 64, nprobe = 4)
      .select(col("query_id"), col("neighbor_id"), col("rank").as("ap_rank"))
    val exact = Similarity
      .bruteForceTopK(all, queries, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").as("ex_rank"))
      .localCheckpoint()
    val hits = refined.join(exact, Seq("query_id", "neighbor_id"))
      .agg(
        coalesce(sum(when(col("ap_rank") <= 1 && col("ex_rank") <= 1, 1L)
          .otherwise(0L)), lit(0L)).as("h1"),
        count(lit(1)).as("h5"))
    val truth = exact.agg(
      coalesce(sum(when(col("ex_rank") <= 1, 1L).otherwise(0L)), lit(0L))
        .as("e1"),
      count(lit(1)).as("e5"))
    hits.crossJoin(broadcast(truth))
      .select(explode(array(
        struct(lit(1).as("k"), col("h1").as("nh"), col("e1").as("ne")),
        struct(lit(5).as("k"), col("h5").as("nh"), col("e5").as("ne"))))
        .as("r"))
      .select(lit("ivfpq_rerank").as("method"),
        col("r.k").cast("int").as("k"),
        col("r.nh").cast("long").as("n_hits"),
        col("r.ne").cast("long").as("n_truth"),
        round(col("r.nh").cast("double") / col("r.ne"), 6).as("recall"))
      .orderBy("k")
  }

  private val q483Sql = GoldenOracle.sql("q483_ivfpq_rerank",
    "method, k, n_hits, n_truth, recall", "k")

  // --------------------------------------------------------------- q484
  /** CLASSIFIER CALIBRATION TABLE — the reliability diagram of the
    * quality classifier against the rule-gate label it stands in for
    * (q478's teacher): per score decile, document count, mean
    * predicted score, observed positive rate, and the |gap|. A
    * well-calibrated filter has gap ≈ 0 per bin; a miscalibrated one
    * silently over- or under-admits when anyone treats the score as a
    * probability (temperature mixing and threshold transfer both do).
    *
    * Determinism: scores are 6-dp rounded BEFORE binning and the mean
    * (the q376 ln/exp precedent), so the bin stamp and the
    * integer-micros sum are engine-exact; every output ratio is one
    * division of exact integers. Scale shape: one zero-shuffle
    * featurize→sigmoid projection + one 10-row hash-agg. */
  private def q484(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val d = Tables(s, dir)("documents")
    val score = round(QualityClassifier.scoreExpr(
      QualityClassifier.defaultModel(col("text"))), 6)
    val y = (col("n_chars") >= 64 && col("n_chars") <= 4096 &&
      size(TextFunctions.tokens(col("text"))) >= 8).cast("long")
    d.select(score.as("s"), y.as("y"))
      .select(least(floor(col("s") * 10), lit(9.0)).cast("int").as("bin"),
        floor(col("s") * 1e6 + 0.5).cast("long").as("sm"), col("y"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("sm").as("sms"), sum("y").as("np"))
      .select(col("bin"),
        col("n").cast("long").as("n_docs"),
        round(col("sms").cast("double") / (col("n") * 1e6), 6)
          .as("mean_score"),
        round(col("np").cast("double") / col("n"), 6).as("pos_rate"),
        round(abs(col("sms").cast("double") / (col("n") * 1e6)
          - col("np").cast("double") / col("n")), 6).as("abs_gap"))
      .orderBy("bin")
  }

  private val q484Sql: String = {
    // feature counts + logit weights from OracleLogit (shared with
    // q386/q424/q426 — the classifier oracles cannot drift per-query)
    s"""WITH f AS (
         ${OracleLogit.featuresSql("n_chars AS raw_chars")}),
       z AS (
         SELECT raw_chars, n_tok,
           ${OracleLogit.zExprSql} AS z
         FROM f),
       sc AS (
         SELECT round(1.0 / (1.0 + exp(-z)), 6) AS s,
           CASE WHEN raw_chars >= 64 AND raw_chars <= 4096
                     AND n_tok >= 8 THEN 1 ELSE 0 END AS y
         FROM z),
       b AS (
         SELECT CAST(least(floor(s * 10), 9.0) AS INT) AS bin,
           CAST(floor(s * 1e6 + 0.5) AS BIGINT) AS sm, y
         FROM sc)
       SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         round(CAST(sum(sm) AS DOUBLE) / (count(*) * 1e6), 6) AS mean_score,
         round(CAST(sum(y) AS DOUBLE) / count(*), 6) AS pos_rate,
         round(abs(CAST(sum(sm) AS DOUBLE) / (count(*) * 1e6)
           - CAST(sum(y) AS DOUBLE) / count(*)), 6) AS abs_gap
       FROM b GROUP BY 1 ORDER BY 1"""
  }

  // --------------------------------------------------------------- q485
  /** SCORE-DRIFT GATE (PSI) — the population-stability index of the
    * quality-score distribution between the standing corpus (reference,
    * 4-in-5 of docs) and a candidate shard (1-in-5): per decile, both
    * counts, both fractions, and the PSI term (p−q)·ln(p/q) with the
    * standard 1e-6 floor. Σ psi_term < 0.1 is the conventional "shard
    * looks like the corpus" bar — the gate an ingestion pipeline reads
    * BEFORE mixing a new crawl dump in, because a drifted score
    * distribution silently shifts every downstream threshold and
    * temperature mix (the q424/q426 transfer problem, caught at the
    * door instead of after the mix).
    *
    * Determinism: scores 6-dp rounded before binning (q376 ln/exp
    * precedent), fractions are divisions of exact integers, the ln
    * term is rounded per row — and the bin spine is a literal 0-9
    * range so empty deciles are explicit zero rows, not absent ones.
    * Scale shape: one zero-shuffle projection + a 10-row hash-agg +
    * a 10-row spine join against two broadcast scalars. */
  private def q485(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val score = round(QualityClassifier.scoreExpr(
      QualityClassifier.defaultModel(col("text"))), 6)
    val scored = d.select(
      least(floor(score * 10), lit(9.0)).cast("int").as("bin"),
      (pmod(col("doc_id"), lit(5)) === 0).as("cand"))
    val perBin = scored.groupBy("bin").agg(
      sum(when(!col("cand"), 1L).otherwise(0L)).as("nr"),
      sum(when(col("cand"), 1L).otherwise(0L)).as("nc"))
    val totals = perBin.agg(sum("nr").as("nrt"), sum("nc").as("nct"))
    val spine = s.range(10).select(col("id").cast("int").as("bin"))
    val p = greatest(col("nr").cast("double") / col("nrt"), lit(1e-6))
    val q = greatest(col("nc").cast("double") / col("nct"), lit(1e-6))
    spine.join(perBin, Seq("bin"), "left")
      .na.fill(0L, Seq("nr", "nc"))
      .crossJoin(broadcast(totals))
      .select(col("bin"),
        col("nr").cast("long").as("n_ref"),
        col("nc").cast("long").as("n_cand"),
        round(col("nr").cast("double") / col("nrt"), 6).as("ref_frac"),
        round(col("nc").cast("double") / col("nct"), 6).as("cand_frac"),
        round((p - q) * log(p / q), 6).as("psi_term"))
      .orderBy("bin")
  }

  private val q485Sql: String =
    s"""WITH f AS (
         ${OracleLogit.featuresSql("doc_id")}),
       z AS (
         SELECT doc_id,
           ${OracleLogit.zExprSql} AS z
         FROM f),
       b AS (
         SELECT CAST(least(floor(round(1.0 / (1.0 + exp(-z)), 6) * 10), 9.0)
                  AS INT) AS bin,
           CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS cand
         FROM z),
       pb AS (
         SELECT bin, sum(1 - cand) AS nr, sum(cand) AS nc
         FROM b GROUP BY 1),
       tot AS (SELECT sum(nr) AS nrt, sum(nc) AS nct FROM pb),
       spine AS (SELECT CAST(g AS INT) AS bin
                 FROM unnest(generate_series(0, 9)) AS t(g)),
       j AS (
         SELECT spine.bin,
           COALESCE(nr, 0) AS nr, COALESCE(nc, 0) AS nc, nrt, nct,
           greatest(CAST(COALESCE(nr, 0) AS DOUBLE) / nrt, 1e-6) AS p,
           greatest(CAST(COALESCE(nc, 0) AS DOUBLE) / nct, 1e-6) AS q
         FROM spine LEFT JOIN pb ON pb.bin = spine.bin CROSS JOIN tot)
       SELECT bin, CAST(nr AS BIGINT) AS n_ref, CAST(nc AS BIGINT) AS n_cand,
         round(CAST(nr AS DOUBLE) / nrt, 6) AS ref_frac,
         round(CAST(nc AS DOUBLE) / nct, 6) AS cand_frac,
         round((p - q) * ln(p / q), 6) AS psi_term
       FROM j ORDER BY bin"""

  override val queries: Map[String, QueryFn] = Map(
    "q483_ivfpq_rerank" -> q483 _,
    "q484_score_calibration" -> q484 _,
    "q485_score_drift" -> q485 _)

  override val oracles: Map[String, String] = Map(
    "q483_ivfpq_rerank" -> q483Sql,
    "q484_score_calibration" -> q484Sql,
    "q485_score_drift" -> q485Sql)
}
