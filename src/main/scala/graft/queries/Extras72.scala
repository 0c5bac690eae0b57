package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Round-12 pack: audit-grade companions for the ANN/bitext mining
  * surface — the trust numbers a 100 TB pipeline reads before
  * believing an approximate index.
  *
  * q472: recall@k of every registered ANN method vs the brute-force
  * truth — the number that decides whether q463's production bitext
  * path (SRP kNN legs) is usable at the configured index size.
  * q473: CCMatrix-style margin-threshold sweep over the mined bitext —
  * per release tier, yield × mean cosine (the table that picks the
  * mining cutoff; Schwenk et al. 2021 sweep the margin exactly so).
  *
  * Oracle discipline: every leg is fully replayed relationally — the
  * brute kNN is plain SQL (q29 shape), SRP legs bake the shared
  * hyperplane literals ([[OracleVec.sigExprSql]], q30 precedent), IVF
  * replays the deterministic centroid assignment (q60 shape), and the
  * recall/tier arithmetic is integer counts with one rounded division.
  */
object Extras72 extends QueryPack {

  import OracleVec.{cosSql, dotSql, nbrAvgSql, normSql, sigExprSql}

  private val Dim = 64

  /** Query-sample size for the ANN recall audits (q472 here, q477/q483/
    * q488 in the later packs — ONE constant so the audits stay
    * comparable row-for-row). 40 = the sf0.1 size of the old 1-in-50
    * modulus sample, now absolute: the brute truth leg costs K·N at
    * every corpus size instead of N²/50. */
  val AuditSampleK = 40

  /** Shared smallest-K md5 query sample — see [[Similarity.hashSample]].
    * SQL twin: [[auditSampleSql]]. */
  def auditSample(all: DataFrame): DataFrame =
    Similarity.hashSample(all, "vec_id", AuditSampleK)

  /** The DuckDB replay of [[auditSample]] as a CTE body. */
  val auditSampleSql: String =
    s"""SELECT vec_id FROM embeddings
        ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT $AuditSampleK"""

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("embeddings")

  // --------------------------------------------------------------- q472
  /** ANN RECALL AUDIT — recall@1 and recall@5 of srpTopK,
    * srpMultiProbeTopK, and ivfTopK against the bruteForceTopK truth
    * over the ABSOLUTELY bounded query sample
    * ([[Similarity.hashSample]]: the [[AuditSampleK]] vectors with the
    * smallest md5(vec_id) — a fixed-K TakeOrderedAndProject, not a
    * fixed FRACTION; the earlier 1-in-50 modulus made the brute truth
    * leg N²/50 at scale, this one is K·N). One row per (method, k):
    * integer hit / truth counts plus the 6-dp recall ratio.
    *
    * Scale shape: the truth relation is k·|queries| rows (bounded —
    * localCheckpointed once, read by all three method joins); each
    * method's kNN is its own banded/bucketed equi-join, never
    * all-pairs; the audit itself is three (query, neighbor)-keyed
    * joins over k-row-per-query relations plus 1-row scalar crosses.
    * At 100 TB only the truth leg is expensive — exactly why it runs
    * over the K-row query SAMPLE, not the corpus. */
  private def q472(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val queries = auditSample(all)
    val centroids = all.filter(col("vec_id") < 16)
    val exact = Similarity
      .bruteForceTopK(all, queries, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").as("ex_rank"))
      .localCheckpoint() // k·|queries| rows, read by all three audits

    def audit(name: String, approx: DataFrame): DataFrame = {
      val ap = approx.select(col("query_id"), col("neighbor_id"),
        col("rank").as("ap_rank"))
      val hits = ap.join(exact, Seq("query_id", "neighbor_id"))
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
        .select(lit(name).as("method"),
          col("r.k").cast("int").as("k"),
          col("r.nh").cast("long").as("n_hits"),
          col("r.ne").cast("long").as("n_truth"),
          round(col("r.nh").cast("double") / col("r.ne"), 6).as("recall"))
    }

    audit("ivf",
        Similarity.ivfTopK(all, queries, "vec_id", "embedding", k = 5,
          centroids = centroids, centroidIdCol = "vec_id", nprobe = 2))
      .unionAll(audit("srp",
        Similarity.srpTopK(all, queries, "vec_id", "embedding",
          k = 5, dim = Dim)))
      .unionAll(audit("srp_multiprobe",
        Similarity.srpMultiProbeTopK(all, queries, "vec_id", "embedding",
          k = 5, dim = Dim)))
      .orderBy("method", "k")
  }

  private val q472Sql: String = {
    val bits = 16
    val bands = 4
    val r = bits / bands
    val mask = (1 << r) - 1
    val sigExpr = sigExprSql(bits)
    val probeList = ("band_key" +: (0 until r).map(j => s"xor(band_key, ${1 << j})"))
      .mkString("[", ", ", "]")
    def methodRows(name: String, cte: String) =
      s"""SELECT '$name' AS method, 1 AS k,
            COALESCE(sum(CASE WHEN a.rank <= 1 AND e.rank <= 1
              THEN 1 ELSE 0 END), 0) AS n_hits
          FROM $cte a JOIN exact e USING (query_id, neighbor_id)
          UNION ALL
          SELECT '$name', 5, count(*)
          FROM $cte a JOIN exact e USING (query_id, neighbor_id)"""
    s"""WITH qs AS MATERIALIZED ($auditSampleSql),
       exact AS MATERIALIZED (
         SELECT query_id, neighbor_id, rank FROM (
           SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS rank
           FROM (
             SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ${cosSql("q.embedding", "c.embedding")} AS cos
             FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
             WHERE q.vec_id IN (SELECT vec_id FROM qs)))
         WHERE rank <= 5),
       sigs AS MATERIALIZED (
         SELECT vec_id, CAST($sigExpr AS BIGINT) AS sig FROM embeddings),
       bands AS MATERIALIZED (
         SELECT vec_id, t.b AS band_idx, (sig >> ($r * t.b)) & $mask AS band_key
         FROM sigs, unnest(generate_series(0, ${bands - 1})) AS t(b)),
       srp AS MATERIALIZED (
         SELECT query_id, neighbor_id, rank FROM (
           SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS rank
           FROM (
             SELECT query_id, neighbor_id,
               ${cosSql("eq.embedding", "ec.embedding")} AS cos
             FROM (
               SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
               FROM bands q JOIN bands c
                 ON q.band_idx = c.band_idx AND q.band_key = c.band_key
               WHERE q.vec_id IN (SELECT vec_id FROM qs)
                 AND q.vec_id <> c.vec_id) cand
             JOIN embeddings eq ON eq.vec_id = query_id
             JOIN embeddings ec ON ec.vec_id = neighbor_id))
         WHERE rank <= 5),
       qprobes AS (
         SELECT vec_id, band_idx, p.pk AS band_key
         FROM bands, unnest($probeList) AS p(pk)
         WHERE vec_id IN (SELECT vec_id FROM qs)),
       mp AS MATERIALIZED (
         SELECT query_id, neighbor_id, rank FROM (
           SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS rank
           FROM (
             SELECT query_id, neighbor_id,
               ${cosSql("eq.embedding", "ec.embedding")} AS cos
             FROM (
               SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
               FROM qprobes q JOIN bands c
                 ON q.band_idx = c.band_idx AND q.band_key = c.band_key
               WHERE q.vec_id <> c.vec_id) cand
             JOIN embeddings eq ON eq.vec_id = query_id
             JOIN embeddings ec ON ec.vec_id = neighbor_id))
         WHERE rank <= 5),
       cent AS (
         SELECT vec_id AS centroid_id, embedding AS centv
         FROM embeddings WHERE vec_id < 16),
       arank AS MATERIALIZED (
         SELECT vec_id, embedding, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY ccos DESC, centroid_id) AS crk
         FROM (
           SELECT e.vec_id, e.embedding, c.centroid_id,
             ${cosSql("e.embedding", "c.centv")} AS ccos
           FROM embeddings e CROSS JOIN cent c)),
       ivf AS MATERIALIZED (
         SELECT query_id, neighbor_id, rank FROM (
           SELECT query_id, neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS rank
           FROM (
             SELECT p.query_id, a.neighbor_id,
               ${cosSql("p.qv", "a.cv")} AS cos
             FROM (SELECT centroid_id AS bucket, vec_id AS query_id,
                     embedding AS qv
                   FROM arank
                   WHERE crk <= 2
                     AND vec_id IN (SELECT vec_id FROM qs)) p
             JOIN (SELECT centroid_id AS bucket, vec_id AS neighbor_id,
                     embedding AS cv
                   FROM arank WHERE crk = 1) a USING (bucket)
             WHERE p.query_id <> a.neighbor_id))
         WHERE rank <= 5),
       truth AS (
         SELECT sum(CASE WHEN rank <= 1 THEN 1 ELSE 0 END) AS e1,
                count(*) AS e5
         FROM exact),
       hits AS (
         ${methodRows("ivf", "ivf")}
         UNION ALL
         ${methodRows("srp", "srp")}
         UNION ALL
         ${methodRows("srp_multiprobe", "mp")})
       SELECT method, k, CAST(n_hits AS BIGINT) AS n_hits,
         CAST(CASE WHEN k = 1 THEN e1 ELSE e5 END AS BIGINT) AS n_truth,
         round(CAST(n_hits AS DOUBLE) /
           (CASE WHEN k = 1 THEN e1 ELSE e5 END), 6) AS recall
       FROM hits CROSS JOIN truth
       ORDER BY method, k"""
  }

  // --------------------------------------------------------------- q473
  /** MARGIN-TIER RELEASE SWEEP — the CCMatrix-style threshold table
    * (Schwenk et al. 2021 sweep the mining margin exactly so): every
    * src's best candidate (NO margin cut — the sweep needs the full
    * range) bucketed into 4 equi-depth margin tiers via
    * [[graft.operators.Curriculum.interleave]]'s integer tiering
    * (tier = (idx·4) div n over the RowIndexer range-sorted index, so
    * boundaries are exact integer division, never float quantiles).
    * Per tier: yield, margin bounds, mean cosine (exact integer-micros
    * sum, order-free), and how many pairs clear the production 1.0
    * cut — the table that picks the mining cutoff.
    *
    * Scale shape: the pair relation is one row per src (bestPairs'
    * WindowGroupLimit-pruned rank); the tier stamp is the range
    * shuffle + offset; the report is a 4-row hash-agg. The kNN legs
    * are brute here (oracle-priced, q457's discipline) — production
    * swaps in the banded legs unchanged. */
  private def q473(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Curriculum, MarginScoring}
    val all = emb(s, dir)
    val src = all.filter(col("label") === 0)
    val tgt = all.filter(col("label") === 1)
    val fwd = Similarity.bruteForceTopK(tgt, src, "vec_id", "embedding", k = 8)
    val bwd = Similarity.bruteForceTopK(src, tgt, "vec_id", "embedding", k = 8)
    // -inf floor = keep every src's best pair (the audit wants the
    // WHOLE margin distribution; any finite sentinel could clip it)
    val mined = MarginScoring.bestPairs(fwd, bwd,
      minMargin = Double.NegativeInfinity)
    Curriculum.interleave(mined, "src_id", "margin", tiers = 4)
      .groupBy("tier")
      .agg(count(lit(1)).as("n_pairs"),
        round(min("margin"), 6).as("margin_lo"),
        round(max("margin"), 6).as("margin_hi"),
        sum(floor(col("cos") * 1e6 + 0.5).cast("long")).as("cs"),
        sum(when(col("margin") >= 1.0, 1L).otherwise(0L)).as("nr"))
      .select(col("tier").cast("long").as("tier"),
        col("n_pairs").cast("long").as("n_pairs"),
        col("margin_lo"), col("margin_hi"),
        round(col("cs").cast("double") / (col("n_pairs") * 1e6), 6)
          .as("mean_cos"),
        col("nr").cast("long").as("n_release"))
      .orderBy("tier")
  }

  private val q473Sql: String = {
    def knn(qTab: String, cTab: String) =
      s"""SELECT query_id, neighbor_id, cos, rank FROM (
           SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id
               ORDER BY cos DESC, neighbor_id) AS rank
           FROM (
             SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ${dotSql("a.embedding", "b.embedding")} /
                 (${normSql("a.embedding")} * ${normSql("b.embedding")}) AS cos
             FROM $qTab a, $cTab b WHERE a.vec_id <> b.vec_id))
         WHERE rank <= 8"""
    s"""WITH s0 AS (SELECT vec_id, embedding FROM embeddings WHERE label = 0),
       s1 AS (SELECT vec_id, embedding FROM embeddings WHERE label = 1),
       fwd AS MATERIALIZED (${knn("s0", "s1")}),
       bwd AS MATERIALIZED (${knn("s1", "s0")}),
       fa AS (SELECT query_id, nbr_avg AS fwd_avg FROM (${nbrAvgSql("fwd")})),
       ba AS (SELECT query_id AS neighbor_id, nbr_avg AS bwd_avg
              FROM (${nbrAvgSql("bwd")})),
       scored AS (
         SELECT fwd.query_id AS src_id, fwd.neighbor_id AS tgt_id,
           round(fwd.cos, 6) AS cos,
           round(fwd.cos / ((fa.fwd_avg + ba.bwd_avg) / 2.0), 6) AS margin
         FROM fwd JOIN fa ON fa.query_id = fwd.query_id
                  JOIN ba ON ba.neighbor_id = fwd.neighbor_id),
       best AS MATERIALIZED (
         SELECT src_id, tgt_id, cos, margin FROM (
           SELECT src_id, tgt_id, cos, margin,
             ROW_NUMBER() OVER (PARTITION BY src_id
               ORDER BY margin DESC, tgt_id) AS rk
           FROM scored)
         WHERE rk = 1),
       idx AS (
         SELECT cos, margin,
           ROW_NUMBER() OVER (ORDER BY margin, src_id) - 1 AS idx,
           COUNT(*) OVER () AS n
         FROM best)
       SELECT CAST((idx * 4) // n AS BIGINT) AS tier,
         CAST(count(*) AS BIGINT) AS n_pairs,
         round(min(margin), 6) AS margin_lo,
         round(max(margin), 6) AS margin_hi,
         round(CAST(sum(CAST(floor(cos * 1e6 + 0.5) AS BIGINT)) AS DOUBLE)
           / (count(*) * 1e6), 6) AS mean_cos,
         CAST(sum(CASE WHEN margin >= 1.0e0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_release
       FROM idx GROUP BY 1 ORDER BY 1"""
  }

  // --------------------------------------------------------------- q474
  /** IN-BATCH FALSE-NEGATIVE AUDIT — contrastive training treats every
    * other in-batch example as a negative, so two near-duplicates
    * landing in the same batch poison the loss with a false negative
    * (the denoising concern in RocketQA, Qu et al. 2021). Over the
    * q465 training slice: near-dup FAMILIES (q26 md5 minhash pairs →
    * spanning-forest components), the q455 md5-shuffled batch
    * assignment (B=32 via the RowIndexer stamp), and the audit — how
    * many same-family pairs cohabit a batch. Collisions per group are
    * m·(m−1)/2 integer arithmetic on (batch, family) counts: no pair
    * join at all.
    *
    * Scale shape: the pair relation is banded (the q26 md5-oracle
    * pricing — UNcapped here so the SQL twin replays it exactly; the
    * production swap is the hot-capped q380 path via maxBucket);
    * components are the O(log) contraction; the batch stamp is one
    * range shuffle; the audit is two stacked hash-aggs over
    * (batch, family) — every stage keyed, nothing corpus×corpus. */
  private def q474(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{ConnectedComponents, Dedup, RowIndexer}
    val d = Tables(s, dir)("documents")
      .filter(pmod(col("doc_id"), lit(5)) === 0)
    val pairs = Dedup.minhashDedupMd5(d, "doc_id", "text")
      .select(col("id_a"), col("id_b"))
    val fams = ConnectedComponents.components(pairs, "id_a", "id_b")
      .select(col("id").as("doc_id"), col("component"))
      .localCheckpoint() // read by the batch join and the family stats
    val keyed = d.select(col("doc_id"),
      md5(concat(lit("shd:"), col("doc_id").cast("string"))).as("skey"))
    val groups = RowIndexer.stableIndex(keyed, Seq(col("skey"), col("doc_id")))
      .withColumn("batch", expr("idx DIV 32"))
      .join(fams, Seq("doc_id"), "left")
      .select(col("batch"),
        coalesce(col("component"), col("doc_id")).as("fam"))
      .groupBy("batch", "fam").agg(count(lit(1)).as("m"))
    val perBatch = groups.groupBy("batch")
      .agg(sum(expr("m * (m - 1) DIV 2")).as("coll"), sum("m").as("bsz"))
    val famStats = fams.groupBy("component").agg(count(lit(1)).as("fs"))
      .agg(count(lit(1)).as("n_families"), sum("fs").as("docs_in_families"))
    perBatch
      .agg(count(lit(1)).as("n_batches"), sum("bsz").as("n_docs"),
        sum("coll").as("collision_pairs"),
        sum(when(col("coll") > 0, 1L).otherwise(0L))
          .as("batches_with_collision"))
      .crossJoin(broadcast(famStats))
      .select(col("n_docs").cast("long").as("n_docs"),
        col("n_batches").cast("long").as("n_batches"),
        col("n_families").cast("long").as("n_families"),
        col("docs_in_families").cast("long").as("docs_in_families"),
        col("collision_pairs").cast("long").as("collision_pairs"),
        col("batches_with_collision").cast("long")
          .as("batches_with_collision"),
        round(col("collision_pairs").cast("double") / col("n_batches"), 6)
          .as("collisions_per_batch"))
  }

  private val q474Sql: String =
    s"""WITH RECURSIVE ${OracleSketch.minhashCtes("doc_id % 5 = 0")},
       edges AS (SELECT id_a, id_b FROM mh_est WHERE e >= 0.2),
       ${OracleSketch.componentsCtes("edges")},
       keyed AS (
         SELECT doc_id, md5('shd:' || CAST(doc_id AS VARCHAR)) AS skey
         FROM documents WHERE doc_id % 5 = 0),
       idx AS (
         SELECT doc_id, ROW_NUMBER() OVER (ORDER BY skey, doc_id) - 1 AS idx
         FROM keyed),
       g AS (
         SELECT (idx // 32) AS batch,
                COALESCE(component, i.doc_id) AS fam, count(*) AS m
         FROM idx i LEFT JOIN cc_fam USING (doc_id)
         GROUP BY 1, 2),
       pb AS (
         SELECT batch, sum(m * (m - 1) // 2) AS coll, sum(m) AS bsz
         FROM g GROUP BY 1),
       fs AS (
         SELECT count(*) AS n_families, sum(fsz) AS docs_in_families
         FROM (SELECT component, count(*) AS fsz FROM cc_fam GROUP BY 1))
       SELECT CAST(sum(bsz) AS BIGINT) AS n_docs,
         CAST(count(*) AS BIGINT) AS n_batches,
         CAST(any_value(n_families) AS BIGINT) AS n_families,
         CAST(any_value(docs_in_families) AS BIGINT) AS docs_in_families,
         CAST(sum(coll) AS BIGINT) AS collision_pairs,
         CAST(sum(CASE WHEN coll > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS batches_with_collision,
         round(CAST(sum(coll) AS DOUBLE) / count(*), 6)
           AS collisions_per_batch
       FROM pb CROSS JOIN fs"""

  // --------------------------------------------------------------- q475
  /** LANGID ACCURACY AUDIT — per-language precision/recall/F1 of the
    * [[graft.operators.LangId]] classifier against the corpus's gold
    * `lang` column, the audit every langid-bucketed pipeline (mC4,
    * CC-Net) publishes before trusting the buckets. The corpus carries
    * a language the 4-language model cannot predict (zh), so the table
    * also prices the out-of-model case: its recall row is the mass the
    * model misroutes, and n_und counts per-language abstentions.
    *
    * All integer counts; F1 = 2·TP/(n_gold + n_pred) so every ratio is
    * one rounded division of exact integers. Scale shape: one
    * zero-shuffle classify projection, materialized as the slim
    * (lang, pred_lang) frame (two tiny hash-aggs read it), then an
    * L-row join — nothing corpus-sized after the scan. */
  private def q475(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.LangId
    val scored = LangId.classify(Tables(s, dir)("documents"), "text")
      .select(col("lang"), col("pred_lang"))
      .localCheckpoint() // slim 2-column frame, read by both aggs
    val gold = scored.groupBy("lang").agg(
      count(lit(1)).as("n_gold"),
      sum(when(col("pred_lang") === col("lang"), 1L).otherwise(0L))
        .as("n_correct"),
      sum(when(col("pred_lang") === "und", 1L).otherwise(0L)).as("n_und"))
    val pred = scored.groupBy(col("pred_lang").as("lang"))
      .agg(count(lit(1)).as("n_pred"))
    gold.join(pred, Seq("lang"), "left")
      .select(col("lang"),
        col("n_gold").cast("long").as("n_gold"),
        col("n_correct").cast("long").as("n_correct"),
        coalesce(col("n_pred"), lit(0L)).cast("long").as("n_pred"),
        col("n_und").cast("long").as("n_und"),
        round(col("n_correct").cast("double")
          / greatest(coalesce(col("n_pred"), lit(0L)), lit(1L)), 6)
          .as("precision"),
        round(col("n_correct").cast("double") / col("n_gold"), 6)
          .as("recall"),
        round(lit(2.0) * col("n_correct")
          / (col("n_gold") + coalesce(col("n_pred"), lit(0L))), 6)
          .as("f1"))
      .orderBy("lang")
  }

  private val q475Sql: String = {
    import graft.operators.LangId
    val langs = LangId.defaultModel.map(_._1)
    s"""WITH s0 AS (
         SELECT lang, ${OracleLangId.surfaceSql("text")} AS s
         FROM documents),
       sc AS (
         SELECT lang,
           ${OracleLangId.scoreListSql()}
         FROM s0),
       preds AS MATERIALIZED (
         SELECT lang, ${OracleLangId.predCaseSql(langs)} AS pred_lang
         FROM sc),
       gold AS (
         SELECT lang, count(*) AS n_gold,
           sum(CASE WHEN pred_lang = lang THEN 1 ELSE 0 END) AS n_correct,
           sum(CASE WHEN pred_lang = 'und' THEN 1 ELSE 0 END) AS n_und
         FROM preds GROUP BY 1),
       pred AS (
         SELECT pred_lang AS lang, count(*) AS n_pred
         FROM preds GROUP BY 1)
       SELECT g.lang,
         CAST(n_gold AS BIGINT) AS n_gold,
         CAST(n_correct AS BIGINT) AS n_correct,
         CAST(COALESCE(n_pred, 0) AS BIGINT) AS n_pred,
         CAST(n_und AS BIGINT) AS n_und,
         round(CAST(n_correct AS DOUBLE)
           / greatest(COALESCE(n_pred, 0), 1), 6) AS precision,
         round(CAST(n_correct AS DOUBLE) / n_gold, 6) AS recall,
         round(2.0 * n_correct / (n_gold + COALESCE(n_pred, 0)), 6) AS f1
       FROM gold g LEFT JOIN pred p ON p.lang = g.lang
       ORDER BY g.lang"""
  }

  // --------------------------------------------------------------- q476
  /** EVAL-SIDE DIRTINESS REPORT — the GPT-3 appendix-C audit flipped
    * from q75's train-side view: for every BENCHMARK document, what
    * fraction of its distinct word 3-grams also appears in the
    * training corpus, plus the any-collision dirty flag. q75 answers
    * "which training docs must I drop"; this answers "which eval
    * examples were already compromised" — the number a model report
    * publishes next to its benchmark scores.
    *
    * Scale shape: identical to q75 — the benchmark side (1-in-97) is
    * the broadcast build side, the training corpus streams through it
    * map-side, and only the distinct (bench_id, gram) hit pairs
    * shuffle; totals come from the bench side alone. Integer counts,
    * one rounded division. */
  private def q476(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    val sh = Tables(s, dir)("documents")
      .select(col("doc_id"), TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(array_distinct(
          TextFunctions.wordShingles(col("toks"), 3))).as("sh"))
    val bench = sh.filter(pmod(col("doc_id"), lit(97)) === 0)
      .select(col("doc_id").as("bench_id"), col("sh"))
    val totals = bench.groupBy("bench_id").agg(count(lit(1)).as("n_ngrams"))
    val hits = sh.filter(pmod(col("doc_id"), lit(97)) =!= 0)
      .join(broadcast(bench), "sh")
      .select(col("bench_id"), col("sh")).distinct()
      .groupBy("bench_id").agg(count(lit(1)).as("n_dirty"))
    totals.join(hits, Seq("bench_id"), "left")
      .select(col("bench_id"),
        col("n_ngrams").cast("long").as("n_ngrams"),
        coalesce(col("n_dirty"), lit(0L)).cast("long").as("n_dirty"),
        round(coalesce(col("n_dirty"), lit(0L)).cast("double")
          / col("n_ngrams"), 6).as("dirty_frac"),
        (coalesce(col("n_dirty"), lit(0L)) > 0).cast("int").as("is_dirty"))
      .orderBy("bench_id")
  }

  private val q476Sql: String = {
    val toksSql = "regexp_split_to_array(trim(text), '\\s+')"
    s"""WITH base AS (
         SELECT doc_id, $toksSql AS toks FROM documents
         WHERE len($toksSql) >= 3),
       sh AS MATERIALIZED (
         SELECT doc_id,
           unnest(list_distinct(list_transform(
             generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS sh
         FROM base),
       bench AS MATERIALIZED (
         SELECT doc_id AS bench_id, sh FROM sh WHERE doc_id % 97 = 0),
       tot AS (SELECT bench_id, count(*) AS n_ngrams FROM bench GROUP BY 1),
       hits AS (
         SELECT bench_id, count(*) AS n_dirty FROM (
           SELECT DISTINCT b.bench_id, b.sh
           FROM bench b JOIN sh t ON t.sh = b.sh
           WHERE t.doc_id % 97 <> 0)
         GROUP BY 1)
       SELECT t.bench_id,
         CAST(n_ngrams AS BIGINT) AS n_ngrams,
         CAST(COALESCE(n_dirty, 0) AS BIGINT) AS n_dirty,
         round(CAST(COALESCE(n_dirty, 0) AS DOUBLE) / n_ngrams, 6)
           AS dirty_frac,
         CAST(COALESCE(n_dirty, 0) > 0 AS INT) AS is_dirty
       FROM tot t LEFT JOIN hits h ON h.bench_id = t.bench_id
       ORDER BY t.bench_id"""
  }

  override val queries: Map[String, QueryFn] = Map(
    "q472_ann_recall" -> q472 _,
    "q473_bitext_tiers" -> q473 _,
    "q474_batch_collisions" -> q474 _,
    "q475_langid_audit" -> q475 _,
    "q476_eval_dirtiness" -> q476 _)

  override val oracles: Map[String, String] = Map(
    "q472_ann_recall" -> q472Sql,
    "q473_bitext_tiers" -> q473Sql,
    "q474_batch_collisions" -> q474Sql,
    "q475_langid_audit" -> q475Sql,
    "q476_eval_dirtiness" -> q476Sql)
}
