package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFunctions, VectorFunctions}
import graft.operators.{Curriculum, Dedup, IctPairs, KmvDistinct, MarginScoring, Similarity}

/** Round-11 pack, part 2: the contrastive-training data loop — semi-hard
  * negative mining over the SRP band index (q456 —
  * [[graft.operators.Similarity.hardNegatives]]), ratio-margin bitext
  * mining (q457 — [[graft.operators.MarginScoring]], Artetxe & Schwenk
  * 2019), and deterministic curriculum interleaving (q458 —
  * [[graft.operators.Curriculum.interleave]], RowIndexer-backed, no
  * global window).
  *
  * Oracle discipline: q456 bakes the shared SRP hyperplane doubles into
  * the SQL exactly like q30; q457's kNN legs are brute-force (the
  * operator's algebra is index-agnostic, see MarginScoring scaladoc);
  * q458 is all-integer arithmetic.
  */
object Extras71 extends QueryPack {

  import OracleVec.{dotSql, nbrAvgSql, normSql}

  private val Dim = 64

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("embeddings")

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("documents")

  // --------------------------------------------------------------- q456
  /** SEMI-HARD NEGATIVES — for every 25th vector as anchor, the top-5
    * other-label candidates with cosine in [0.1, 0.8), mined from the
    * shared SRP band index (16 bits × 4 bands). The band filter runs
    * BEFORE the rank, so rank 1 = hardest usable negative; near-dups
    * (cos ≥ 0.8) never enter the negative pool. */
  private def q456(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val anchors = all.filter(pmod(col("vec_id"), lit(25)) === 0)
    Similarity.hardNegatives(all, anchors, "vec_id", "embedding", "label",
                             k = 5, dim = Dim, loCos = 0.1, hiCos = 0.8)
      .select(col("query_id"), col("neighbor_id"),
              round(col("cos"), 6).as("cos"), col("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val q456Sql: String = {
    val bits = 16
    val bands = 4
    val r = bits / bands
    val mask = (1 << r) - 1
    val sigExpr = OracleVec.sigExprSql(bits)
    s"""WITH sigs AS (
         SELECT vec_id, label, CAST($sigExpr AS BIGINT) AS sig FROM embeddings),
       bands AS (
         SELECT vec_id, label, t.b AS band_idx, (sig >> ($r * t.b)) & $mask AS band_key
         FROM sigs, unnest(generate_series(0, ${bands - 1})) AS t(b)),
       cand AS (
         SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         FROM bands q JOIN bands c
           ON q.band_idx = c.band_idx AND q.band_key = c.band_key
         WHERE q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id
           AND q.label <> c.label),
       scored AS (
         SELECT query_id, neighbor_id,
           ${dotSql("eq.embedding", "ec.embedding")} /
             (${normSql("eq.embedding")} * ${normSql("ec.embedding")}) AS cos
         FROM cand
         JOIN embeddings eq ON eq.vec_id = query_id
         JOIN embeddings ec ON ec.vec_id = neighbor_id),
       banded AS (SELECT * FROM scored WHERE cos >= 0.1e0 AND cos < 0.8e0),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         FROM banded)
       SELECT query_id, neighbor_id, round(cos, 6) AS cos, CAST(rank AS INT) AS rank
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  // --------------------------------------------------------------- q457
  /** MARGIN-MINED BITEXT — label 0 as the "source language" side, label
    * 1 as the "target"; k=8 neighborhoods both directions, each src's
    * best candidate by ratio margin, kept at margin ≥ 1.0 (closer than
    * both endpoints' ambient neighborhood density). kNN legs are exact
    * here (oracle-priced); at scale the same operator takes
    * srpTopK/ivfTopK legs unchanged. */
  private def q457(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val src = all.filter(col("label") === 0)
    val tgt = all.filter(col("label") === 1)
    val fwd = Similarity.bruteForceTopK(tgt, src, "vec_id", "embedding", k = 8)
    val bwd = Similarity.bruteForceTopK(src, tgt, "vec_id", "embedding", k = 8)
    MarginScoring.bestPairs(fwd, bwd, minMargin = 1.0)
      .orderBy(col("src_id"))
  }

  private val q457Sql: String = {
    // kNN leg: queries from `qTab`, corpus from `cTab` (both CTEs below)
    def knn(qTab: String, cTab: String) =
      s"""SELECT query_id, neighbor_id, cos, rank FROM (
           SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           FROM (
             SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ${dotSql("a.embedding", "b.embedding")} /
                 (${normSql("a.embedding")} * ${normSql("b.embedding")}) AS cos
             FROM $qTab a, $cTab b WHERE a.vec_id <> b.vec_id))
         WHERE rank <= 8"""
    s"""WITH s0 AS (SELECT vec_id, embedding FROM embeddings WHERE label = 0),
       s1 AS (SELECT vec_id, embedding FROM embeddings WHERE label = 1),
       fwd AS (${knn("s0", "s1")}),
       bwd AS (${knn("s1", "s0")}),
       fa AS (SELECT query_id, nbr_avg AS fwd_avg FROM (${nbrAvgSql("fwd")})),
       ba AS (SELECT query_id AS neighbor_id, nbr_avg AS bwd_avg FROM (${nbrAvgSql("bwd")})),
       scored AS (
         SELECT fwd.query_id AS src_id, fwd.neighbor_id AS tgt_id,
           round(fwd.cos, 6) AS cos,
           round(fwd.cos / ((fa.fwd_avg + ba.bwd_avg) / 2.0), 6) AS margin
         FROM fwd JOIN fa ON fa.query_id = fwd.query_id
                  JOIN ba ON ba.neighbor_id = fwd.neighbor_id),
       best AS (
         SELECT src_id, tgt_id, cos, margin,
           ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rk
         FROM scored)
       SELECT src_id, tgt_id, cos, margin FROM best
       WHERE rk = 1 AND margin >= 1.0e0 ORDER BY src_id"""
  }

  // --------------------------------------------------------------- q458
  /** CURRICULUM INTERLEAVE — documents scheduled easy→hard by n_chars
    * into 4 equi-depth tiers, round-robined so every training window
    * sees all difficulty tiers. All-integer; the global index is the
    * RowIndexer range-sort, not a one-partition window. */
  private def q458(s: SparkSession, dir: String): DataFrame =
    Curriculum.interleave(
        docs(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", tiers = 4)
      .select(col("doc_id"), col("tier"), col("pos"), col("ord"))
      .orderBy(col("ord"))

  private val q458Sql: String =
    s"""WITH idx AS (
         SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS idx,
           COUNT(*) OVER () AS n
         FROM documents),
       t AS (SELECT doc_id, idx, n, (idx * 4) // n AS tier FROM idx),
       p AS (SELECT doc_id, tier, idx - (tier * n + 3) // 4 AS pos FROM t)
       SELECT doc_id, CAST(tier AS BIGINT) AS tier, CAST(pos AS BIGINT) AS pos,
         CAST(pos * 4 + tier AS BIGINT) AS ord
       FROM p ORDER BY ord"""

  // --------------------------------------------------------------- q459
  /** ICT POSITIVE PAIRS — each document's held-out 32-token chunk as
    * pseudo-query, the remainder as its positive context; digests +
    * token counts only (the trainer's pair manifest). Held-out index
    * is doc_id mod n_chunks — deterministic in both engines. */
  private def q459(s: SparkSession, dir: String): DataFrame =
    IctPairs.pairs(docs(s, dir), "doc_id", "text", chunkTokens = 32)
      .orderBy(col("doc_id"))

  private val q459Sql: String =
    s"""WITH base AS (
         SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
         FROM documents),
       ch AS MATERIALIZED (
         SELECT doc_id, u.st // 32 AS chunk_idx,
           len(toks[u.st + 1 : u.st + 32]) AS n_tokens,
           array_to_string(toks[u.st + 1 : u.st + 32], ' ') AS chunk_text
         FROM base,
           unnest(generate_series(0, greatest(len(toks) - 1, 0), 32))
             AS u(st)),
       agg AS (
         SELECT doc_id, count(*) AS n_chunks, sum(n_tokens) AS total_tokens
         FROM ch GROUP BY doc_id),
       q AS (
         SELECT ch.doc_id, n_chunks, total_tokens,
           md5(chunk_text) AS query_md5, ch.n_tokens AS query_tokens
         FROM ch JOIN agg USING (doc_id)
         WHERE chunk_idx = doc_id % n_chunks),
       ctx AS (
         SELECT ch.doc_id,
           md5(string_agg(chunk_text, ' ' ORDER BY chunk_idx)) AS ctx_md5
         FROM ch JOIN agg USING (doc_id)
         WHERE chunk_idx <> doc_id % n_chunks
         GROUP BY ch.doc_id)
       SELECT q.doc_id, n_chunks, CAST(q.doc_id % n_chunks AS BIGINT) AS q_idx,
         query_md5, CAST(query_tokens AS BIGINT) AS query_tokens,
         COALESCE(ctx_md5, md5('')) AS ctx_md5,
         CAST(total_tokens - query_tokens AS BIGINT) AS ctx_tokens
       FROM q LEFT JOIN ctx ON ctx.doc_id = q.doc_id
       ORDER BY q.doc_id"""

  // --------------------------------------------------------------- q460
  /** TRAINING TRIPLETS — the assembled contrastive batch manifest:
    * anchor (every 25th vector), positive = its top same-label
    * neighbor (label-blocked exact join, the q31 blocking story), and
    * negative = [[Similarity.hardNegatives]] rank 1 from the SRP band
    * index. gap = pos_cos − neg_cos (both 6-dp first) is the quantity
    * a triplet loss margins against. */
  private def q460(s: SparkSession, dir: String): DataFrame = {
    import VectorFunctions.{dot, norm, toDoubleVec}
    val all = emb(s, dir)
    val withN = all.select(col("vec_id"), col("label"),
        toDoubleVec(col("embedding")).as("v"))
      .withColumn("nv", norm(col("v")))
    val anch = withN.filter(pmod(col("vec_id"), lit(25)) === 0)
      .select(col("vec_id").as("anchor_id"), col("label").as("a_label"),
              col("v").as("av"), col("nv").as("an"))
    val cand = withN.select(col("vec_id").as("pos_id"), col("label"),
                            col("v").as("cv"), col("nv").as("cn"))
    val cosPos = when(col("an") * col("cn") === 0.0, 0.0)
      .otherwise(dot(col("av"), col("cv")) / (col("an") * col("cn")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("anchor_id"))
      .orderBy(col("pos_cos").desc, col("pos_id"))
    val pos = cand.join(broadcast(anch),
        col("label") === col("a_label") &&
        col("pos_id") =!= col("anchor_id"))
      .select(col("anchor_id"), col("pos_id"), cosPos.as("pos_cos"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") === 1).drop("rk")
    val anchors = all.filter(pmod(col("vec_id"), lit(25)) === 0)
    val neg = Similarity.hardNegatives(all, anchors, "vec_id", "embedding",
        "label", k = 1, dim = Dim, loCos = 0.1, hiCos = 0.8)
      .select(col("query_id").as("anchor_id"),
              col("neighbor_id").as("neg_id"), col("cos").as("neg_cos"))
    pos.join(neg, "anchor_id")
      .select(col("anchor_id"), col("pos_id"),
              round(col("pos_cos"), 6).as("pos_cos"),
              col("neg_id"), round(col("neg_cos"), 6).as("neg_cos"),
              round(round(col("pos_cos"), 6) - round(col("neg_cos"), 6), 6)
                .as("gap"))
      .orderBy(col("anchor_id"))
  }

  private val q460Sql: String = {
    val bits = 16
    val bands = 4
    val r = bits / bands
    val mask = (1 << r) - 1
    val sigExpr = OracleVec.sigExprSql(bits)
    s"""WITH pos AS (
         SELECT anchor_id, pos_id, pos_cos FROM (
           SELECT a.vec_id AS anchor_id, b.vec_id AS pos_id,
             ${dotSql("a.embedding", "b.embedding")} /
               (${normSql("a.embedding")} * ${normSql("b.embedding")}) AS pos_cos,
             ROW_NUMBER() OVER (PARTITION BY a.vec_id
               ORDER BY ${dotSql("a.embedding", "b.embedding")} /
                 (${normSql("a.embedding")} * ${normSql("b.embedding")}) DESC,
                 b.vec_id) AS rk
           FROM embeddings a JOIN embeddings b
             ON a.label = b.label AND a.vec_id <> b.vec_id
           WHERE a.vec_id % 25 = 0)
         WHERE rk = 1),
       sigs AS (
         SELECT vec_id, label, CAST($sigExpr AS BIGINT) AS sig FROM embeddings),
       bands AS (
         SELECT vec_id, label, t.b AS band_idx, (sig >> ($r * t.b)) & $mask AS band_key
         FROM sigs, unnest(generate_series(0, ${bands - 1})) AS t(b)),
       cand AS (
         SELECT DISTINCT q.vec_id AS anchor_id, c.vec_id AS neg_id
         FROM bands q JOIN bands c
           ON q.band_idx = c.band_idx AND q.band_key = c.band_key
         WHERE q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id
           AND q.label <> c.label),
       scored AS (
         SELECT anchor_id, neg_id,
           ${dotSql("eq.embedding", "ec.embedding")} /
             (${normSql("eq.embedding")} * ${normSql("ec.embedding")}) AS neg_cos
         FROM cand
         JOIN embeddings eq ON eq.vec_id = anchor_id
         JOIN embeddings ec ON ec.vec_id = neg_id),
       neg AS (
         SELECT anchor_id, neg_id, neg_cos FROM (
           SELECT anchor_id, neg_id, neg_cos,
             ROW_NUMBER() OVER (PARTITION BY anchor_id
               ORDER BY neg_cos DESC, neg_id) AS rk
           FROM scored WHERE neg_cos >= 0.1e0 AND neg_cos < 0.8e0)
         WHERE rk = 1)
       SELECT pos.anchor_id, pos_id, round(pos_cos, 6) AS pos_cos,
         neg_id, round(neg_cos, 6) AS neg_cos,
         round(round(pos_cos, 6) - round(neg_cos, 6), 6) AS gap
       FROM pos JOIN neg ON neg.anchor_id = pos.anchor_id
       ORDER BY pos.anchor_id"""
  }

  // --------------------------------------------------------------- q461
  /** DEDUP-METHOD AGREEMENT — the QA audit a curation team runs before
    * trusting one near-dup method at scale: the minhash-LSH pair set
    * (est-Jaccard ≥ 0.2) vs the simhash pair set (hamming ≤ 6) on the
    * SAME sample (q26/q27's parameters exactly), reduced to set
    * cardinalities, exclusive counts, and the Jaccard of the two PAIR
    * SETS. Both legs are the banded/chunked md5 twins (oracle-priced;
    * production runs the xxhash64 pipelines, q343/q344). One
    * full-outer equi-join of two bounded pair relations — never
    * corpus-sized. */
  private def q461(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(pmod(col("doc_id"), lit(5)) === 0)
    val mh = Dedup.minhashDedupMd5(d, "doc_id", "text")
      .select(col("id_a"), col("id_b")).withColumn("in_mh", lit(1))
    val sh = Dedup.simhashDedupMd5(d, "doc_id", "text")
      .select(col("id_a"), col("id_b")).withColumn("in_sh", lit(1))
    mh.join(sh, Seq("id_a", "id_b"), "full_outer")
      .agg(
        sum(coalesce(col("in_mh"), lit(0))).as("n_minhash"),
        sum(coalesce(col("in_sh"), lit(0))).as("n_simhash"),
        sum(when(col("in_mh").isNotNull && col("in_sh").isNotNull, 1)
          .otherwise(0)).as("n_both"))
      .select(col("n_minhash"), col("n_simhash"), col("n_both"),
        (col("n_minhash") - col("n_both")).as("only_minhash"),
        (col("n_simhash") - col("n_both")).as("only_simhash"),
        round(col("n_both").cast("double") /
          (col("n_minhash") + col("n_simhash") - col("n_both")), 6)
          .as("pair_jaccard"))
  }

  private val q461Sql: String =
    s"""WITH ${OracleSketch.minhashCtes("doc_id % 5 = 0")},
       ${OracleSketch.simhashCtes("doc_id % 5 = 0")},
       mh AS (SELECT id_a, id_b FROM mh_est WHERE e >= 0.2),
       sh AS (SELECT id_a, id_b FROM sh_ham WHERE hamming <= 6),
       u AS (
         SELECT CASE WHEN mh.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_mh,
                CASE WHEN sh.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_sh
         FROM mh FULL OUTER JOIN sh
           ON mh.id_a = sh.id_a AND mh.id_b = sh.id_b),
       agg AS (
         SELECT CAST(sum(in_mh) AS BIGINT) AS n_minhash,
                CAST(sum(in_sh) AS BIGINT) AS n_simhash,
                CAST(sum(in_mh * in_sh) AS BIGINT) AS n_both
         FROM u)
       SELECT n_minhash, n_simhash, n_both,
         n_minhash - n_both AS only_minhash,
         n_simhash - n_both AS only_simhash,
         round(CAST(n_both AS DOUBLE) /
           (n_minhash + n_simhash - n_both), 6) AS pair_jaccard
       FROM agg"""

  // --------------------------------------------------------------- q462
  /** SOURCE-OVERLAP MATRIX via KMV set operations — est union /
    * intersection / Jaccard of every source pair's token VOCABULARY
    * from k=128 bottom-hash sketches: the cross-source duplication
    * triage a 100 TB curation run does WITHOUT any pair join on the
    * data (one corpus pass builds 128-row sketches; the 190-pair
    * matrix runs on those). Deterministic md5-uniform hashes, so both
    * engines replay the estimator bit-for-bit. Generalizes q361's
    * one-pair inclusion-exclusion set algebra (Extras55) to the full
    * G×G matrix with the union-sketch ρ estimator, as an operator. */
  private def q462(s: SparkSession, dir: String): DataFrame = {
    val toks = docs(s, dir).select(col("source"),
      explode(TextFunctions.tokens(col("text"))).as("tok"))
    KmvDistinct.overlapEstimate(toks, "source", col("tok"),
        k = 128, salt = "kmvset")
      .orderBy(col("src_a"), col("src_b"))
  }

  private val q462Sql: String =
    s"""WITH d AS (
         SELECT DISTINCT g,
           ('0x' || substr(md5(tok || '-kmvset'), 1, 8))::BIGINT
             / 4294967296.0 AS h
         FROM (SELECT source AS g,
                 unnest(regexp_split_to_array(trim(text), '\\s+')) AS tok
               FROM documents)),
       sk AS MATERIALIZED (
         SELECT g, h FROM (
           SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS r
           FROM d)
         WHERE r <= 128),
       gs AS (SELECT DISTINCT g FROM sk),
       pr AS (SELECT x.g AS ga, y.g AS gb FROM gs x JOIN gs y ON x.g < y.g),
       ph AS (
         SELECT ga, gb, h, max(a) AS in_a, max(b) AS in_b FROM (
           SELECT pr.ga, pr.gb, sk.h, 1 AS a, 0 AS b
           FROM pr JOIN sk ON sk.g = pr.ga
           UNION ALL
           SELECT pr.ga, pr.gb, sk.h, 0 AS a, 1 AS b
           FROM pr JOIN sk ON sk.g = pr.gb)
         GROUP BY ga, gb, h),
       agg AS (
         SELECT ga, gb, count(*) AS n_kept,
           max(CASE WHEN r = 128 THEN h END) AS hk,
           sum(CASE WHEN in_a = 1 AND in_b = 1 THEN 1 ELSE 0 END) AS n_common
         FROM (SELECT *, row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS r
               FROM ph)
         WHERE r <= 128 GROUP BY ga, gb),
       est AS (
         SELECT ga, gb, n_kept, n_common,
           CASE WHEN n_kept < 128 THEN CAST(n_kept AS DOUBLE)
                ELSE 127.0 / hk END AS eu,
           CAST(n_common AS DOUBLE) /
             (CASE WHEN n_kept < 128 THEN n_kept ELSE 128 END) AS jac
         FROM agg)
       SELECT ga AS src_a, gb AS src_b,
         CAST(n_kept AS BIGINT) AS n_union_kept,
         CAST(n_common AS BIGINT) AS n_common,
         round(eu, 4) AS est_union,
         round(jac, 6) AS est_jaccard,
         round(jac * eu, 4) AS est_intersection
       FROM est ORDER BY src_a, src_b"""

  // --------------------------------------------------------------- q463
  /** MARGIN BITEXT, PRODUCTION PATH — q457's exact algebra with the
    * kNN legs swapped for the SRP band index (the q343/q344 pattern:
    * bench the 100 TB shape, oracle it fully — SRP is SQL-replayable
    * via the baked hyperplanes, unlike xxhash64). Candidates come from
    * banded equi-joins both directions; neighborhood averages are over
    * whatever the index surfaced, exactly as a production miner's
    * would be. */
  private def q463(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val src = all.filter(col("label") === 0)
    val tgt = all.filter(col("label") === 1)
    val fwd = Similarity.srpTopK(tgt, src, "vec_id", "embedding",
      k = 8, dim = Dim)
    val bwd = Similarity.srpTopK(src, tgt, "vec_id", "embedding",
      k = 8, dim = Dim)
    MarginScoring.bestPairs(fwd, bwd, minMargin = 1.0)
      .orderBy(col("src_id"))
  }

  private val q463Sql: String = {
    val bits = 16
    val bands = 4
    val r = bits / bands
    val mask = (1 << r) - 1
    val sigExpr = OracleVec.sigExprSql(bits)
    // kNN leg over the band index: queries from `qTab`, corpus `cTab`
    def knn(qTab: String, cTab: String) =
      s"""SELECT query_id, neighbor_id, cos, rank FROM (
           SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           FROM (
             SELECT cand.query_id, cand.neighbor_id,
               ${dotSql("eq.embedding", "ec.embedding")} /
                 (${normSql("eq.embedding")} * ${normSql("ec.embedding")}) AS cos
             FROM (SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
                   FROM ${qTab}_bands q JOIN ${cTab}_bands c
                     ON q.band_idx = c.band_idx AND q.band_key = c.band_key
                   WHERE q.vec_id <> c.vec_id) cand
             JOIN embeddings eq ON eq.vec_id = cand.query_id
             JOIN embeddings ec ON ec.vec_id = cand.neighbor_id))
         WHERE rank <= 8"""
    def bandsCte(tab: String, label: Int) =
      s"""${tab}_sigs AS (
           SELECT vec_id, CAST($sigExpr AS BIGINT) AS sig
           FROM embeddings WHERE label = $label),
         ${tab}_bands AS (
           SELECT vec_id, t.b AS band_idx, (sig >> ($r * t.b)) & $mask AS band_key
           FROM ${tab}_sigs, unnest(generate_series(0, ${bands - 1})) AS t(b))"""
    s"""WITH ${bandsCte("s0", 0)},
       ${bandsCte("s1", 1)},
       fwd AS (${knn("s0", "s1")}),
       bwd AS (${knn("s1", "s0")}),
       fa AS (SELECT query_id, nbr_avg AS fwd_avg FROM (${nbrAvgSql("fwd")})),
       ba AS (SELECT query_id AS neighbor_id, nbr_avg AS bwd_avg FROM (${nbrAvgSql("bwd")})),
       scored AS (
         SELECT fwd.query_id AS src_id, fwd.neighbor_id AS tgt_id,
           round(fwd.cos, 6) AS cos,
           round(fwd.cos / ((fa.fwd_avg + ba.bwd_avg) / 2.0), 6) AS margin
         FROM fwd JOIN fa ON fa.query_id = fwd.query_id
                  JOIN ba ON ba.neighbor_id = fwd.neighbor_id),
       best AS (
         SELECT src_id, tgt_id, cos, margin,
           ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rk
         FROM scored)
       SELECT src_id, tgt_id, cos, margin FROM best
       WHERE rk = 1 AND margin >= 1.0e0 ORDER BY src_id"""
  }

  // --------------------------------------------------------------- q464
  /** HUBNESS AUDIT — the reverse-kNN degree histogram that motivates
    * margin normalization (Radovanović et al. 2010: in high dimension
    * a few "hub" vectors appear in a disproportionate share of top-k
    * lists, inflating raw-cosine mining). Every 10th vector queries
    * exact top-5; each corpus vector's reverse degree = how many
    * top-5 lists it lands in (0 included via the corpus join);
    * output: degree → vector count. */
  private def q464(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val queries = all.filter(pmod(col("vec_id"), lit(10)) === 0)
    val hits = Similarity.bruteForceTopK(all, queries, "vec_id", "embedding", k = 5)
      .groupBy(col("neighbor_id")).agg(count(lit(1)).as("deg"))
    all.select(col("vec_id").as("neighbor_id"))
      .join(hits, Seq("neighbor_id"), "left")
      .select(coalesce(col("deg"), lit(0L)).as("reverse_degree"))
      .groupBy(col("reverse_degree"))
      .agg(count(lit(1)).as("n_vectors"))
      .orderBy(col("reverse_degree"))
  }

  private val q464Sql: String =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 10 = 0),
       c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
       scored AS (
         SELECT query_id, neighbor_id,
           ${dotSql("qv", "cv")} / (${normSql("qv")} * ${normSql("cv")}) AS cos
         FROM c JOIN q ON query_id <> neighbor_id),
       ranked AS (
         SELECT query_id, neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         FROM scored),
       hits AS (
         SELECT neighbor_id, count(*) AS deg
         FROM ranked WHERE rank <= 5 GROUP BY neighbor_id),
       degs AS (
         SELECT COALESCE(deg, 0) AS reverse_degree
         FROM embeddings e LEFT JOIN hits ON hits.neighbor_id = e.vec_id)
       SELECT CAST(reverse_degree AS BIGINT) AS reverse_degree,
         count(*) AS n_vectors
       FROM degs GROUP BY reverse_degree ORDER BY reverse_degree"""

  // --------------------------------------------------------------- q465
  /** PREFERENCE PAIRS FROM NEAR-DUP FAMILIES — the DPO/RLHF data-prep
    * move hiding inside dedup: a near-duplicate pair is two drafts of
    * the same content, so (higher-quality, lower-quality) is a free
    * preference pair with a built-in "same topic" control. Pairs come
    * from the q26 minhash relation; quality is the type-token ratio
    * (the adaptive gate's signal); chosen = higher TTR, smaller id on
    * exact ties. ttr_delta is the preference margin a trainer would
    * weight by. */
  private def q465(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions.typeTokenRatio
    val d = docs(s, dir).filter(pmod(col("doc_id"), lit(5)) === 0)
    val pairs = Dedup.minhashDedupMd5(d, "doc_id", "text")
    val ttr = d.select(col("doc_id"), typeTokenRatio(col("text")).as("ttr"))
    pairs
      .join(ttr.select(col("doc_id").as("id_a"), col("ttr").as("ttr_a")), "id_a")
      .join(ttr.select(col("doc_id").as("id_b"), col("ttr").as("ttr_b")), "id_b")
      .select(
        when(col("ttr_a") >= col("ttr_b"), col("id_a")).otherwise(col("id_b"))
          .as("chosen_id"),
        when(col("ttr_a") >= col("ttr_b"), col("id_b")).otherwise(col("id_a"))
          .as("rejected_id"),
        round(greatest(col("ttr_a"), col("ttr_b")), 6).as("chosen_ttr"),
        round(least(col("ttr_a"), col("ttr_b")), 6).as("rejected_ttr"),
        round(abs(col("ttr_a") - col("ttr_b")), 6).as("ttr_delta"),
        round(col("est_jaccard"), 6).as("est_jaccard"))
      .orderBy(col("chosen_id"), col("rejected_id"))
  }

  private val q465Sql: String =
    s"""WITH ${OracleSketch.minhashCtes("doc_id % 5 = 0")},
       pairs AS (SELECT id_a, id_b, e FROM mh_est WHERE e >= 0.2),
       ttr AS (
         SELECT doc_id,
           CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) AS ttr
         FROM (SELECT doc_id,
                 regexp_split_to_array(trim(text), '\\s+') AS toks
               FROM documents WHERE doc_id % 5 = 0))
       SELECT
         CASE WHEN a.ttr >= b.ttr THEN id_a ELSE id_b END AS chosen_id,
         CASE WHEN a.ttr >= b.ttr THEN id_b ELSE id_a END AS rejected_id,
         round(greatest(a.ttr, b.ttr), 6) AS chosen_ttr,
         round(least(a.ttr, b.ttr), 6) AS rejected_ttr,
         round(abs(a.ttr - b.ttr), 6) AS ttr_delta,
         round(e, 6) AS est_jaccard
       FROM pairs
       JOIN ttr a ON a.doc_id = id_a
       JOIN ttr b ON b.doc_id = id_b
       ORDER BY chosen_id, rejected_id"""

  // --------------------------------------------------------------- q466
  /** MUTUAL-BEST BITEXT (the "intersection" strategy, Artetxe &
    * Schwenk §3.2) — a pair survives only when each endpoint is the
    * other's margin-best; strictest published strategy, highest
    * precision. Same exact kNN legs as q457; the tgt→src legs swap
    * roles, no extra index work. */
  private def q466(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val src = all.filter(col("label") === 0)
    val tgt = all.filter(col("label") === 1)
    val fwd = Similarity.bruteForceTopK(tgt, src, "vec_id", "embedding", k = 8)
    val bwd = Similarity.bruteForceTopK(src, tgt, "vec_id", "embedding", k = 8)
    MarginScoring.mutualPairs(fwd, bwd, minMargin = 1.0)
      .orderBy(col("src_id"))
  }

  private val q466Sql: String = {
    def knn(qTab: String, cTab: String) =
      s"""SELECT query_id, neighbor_id, cos, rank FROM (
           SELECT query_id, neighbor_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
           FROM (
             SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               ${dotSql("a.embedding", "b.embedding")} /
                 (${normSql("a.embedding")} * ${normSql("b.embedding")}) AS cos
             FROM $qTab a, $cTab b WHERE a.vec_id <> b.vec_id))
         WHERE rank <= 8"""
    // margin-best of `dir` (the forward relation) normalized by both
    // neighborhoods; identical algebra to q457's best CTE
    def best(fw: String, bw: String) =
      s"""SELECT src_id, tgt_id, cos, margin FROM (
           SELECT src_id, tgt_id, cos, margin,
             ROW_NUMBER() OVER (PARTITION BY src_id ORDER BY margin DESC, tgt_id) AS rk
           FROM (
             SELECT $fw.query_id AS src_id, $fw.neighbor_id AS tgt_id,
               round($fw.cos, 6) AS cos,
               round($fw.cos / ((fa.fwd_avg + ba.bwd_avg) / 2.0), 6) AS margin
             FROM $fw
             JOIN (SELECT query_id, nbr_avg AS fwd_avg FROM (${nbrAvgSql(fw)})) fa
               ON fa.query_id = $fw.query_id
             JOIN (SELECT query_id AS neighbor_id, nbr_avg AS bwd_avg FROM (${nbrAvgSql(bw)})) ba
               ON ba.neighbor_id = $fw.neighbor_id))
         WHERE rk = 1 AND margin >= 1.0e0"""
    s"""WITH s0 AS (SELECT vec_id, embedding FROM embeddings WHERE label = 0),
       s1 AS (SELECT vec_id, embedding FROM embeddings WHERE label = 1),
       fwd AS MATERIALIZED (${knn("s0", "s1")}),
       bwd AS MATERIALIZED (${knn("s1", "s0")}),
       sb AS (${best("fwd", "bwd")}),
       tb AS (${best("bwd", "fwd")})
       SELECT sb.src_id, sb.tgt_id, sb.cos, sb.margin
       FROM sb JOIN tb ON tb.src_id = sb.tgt_id AND tb.tgt_id = sb.src_id
       ORDER BY sb.src_id"""
  }

  // --------------------------------------------------------------- q467
  /** SOURCE-HOLDOUT ABLATION MANIFESTS — the data-ablation prep a
    * mixture study runs before committing a recipe: for EVERY source
    * held out, re-apportion the same 10000-unit budget over the
    * remaining sources at α = 1/2
    * ([[graft.operators.TemperatureMix.allocateGrouped]] — S
    * independent largest-remainder allocations in one plan). Each
    * holdout's column sums to exactly 10000; weights are the
    * IEEE-exact n^(1/2) tree, so the oracle replays every quota. */
  private def q467(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.TemperatureMix
    val cnt = docs(s, dir).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"))
      .localCheckpoint() // read twice: holdout list × remaining sources
    val hx = cnt.select(col("source").as("holdout"))
      .join(cnt, col("source") =!= col("holdout"))
    TemperatureMix.allocateGrouped(hx, "holdout", "source", "n_docs",
        budget = 10000L, alphaQuarters = 2)
      .select(col("holdout"), col("source"), col("n").as("n_docs"),
              col("alloc"))
      .orderBy(col("holdout"), col("source"))
  }

  private val q467Sql: String = {
    val root = "sqrt(sqrt(CAST(n AS DOUBLE)))"
    val wExpr = s"1.0 * $root * $root"
    s"""WITH cnt AS MATERIALIZED (
         SELECT source, count(*) AS n FROM documents GROUP BY 1),
       hx AS (
         SELECT h.source AS holdout, c.source AS src, c.n
         FROM cnt h JOIN cnt c ON c.source <> h.source),
       tw AS (
         SELECT holdout, list_sum(list_transform(
           list({'k': src, 'w': $wExpr} ORDER BY src), e -> e.w)) AS tw
         FROM hx GROUP BY holdout),
       q AS (
         SELECT hx.holdout, hx.src, hx.n,
           CAST(floor(10000.0 * ($wExpr) / tw) AS BIGINT) AS fq,
           10000.0 * ($wExpr) / tw
             - floor(10000.0 * ($wExpr) / tw) AS rem
         FROM hx JOIN tw USING (holdout)),
       a AS (
         SELECT holdout, src, n,
           fq + CASE WHEN row_number() OVER (PARTITION BY holdout ORDER BY rem DESC, src)
                       <= 10000 - sum(fq) OVER (PARTITION BY holdout)
                     THEN 1 ELSE 0 END AS alloc
         FROM q)
       SELECT holdout, src AS source, CAST(n AS BIGINT) AS n_docs,
         CAST(alloc AS BIGINT) AS alloc
       FROM a ORDER BY holdout, source"""
  }

  // --------------------------------------------------------------- q468
  /** PERSONALIZED PAGERANK from trusted seeds (Haveliwala 2002 — the
    * link-graph quality-propagation move in crawl curation: score
    * everything by proximity to a hand-trusted seed set, not global
    * centrality). Seeds = every 5th nation on the q133 trade graph;
    * five unrolled iterations so the oracle spells the same CTE chain
    * with the teleport vector threaded through pr0 and every step. */
  private def q468(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.PageRank
    val t = Tables(s, dir)
    val edges = t("lineitem")
      .join(t("orders"), col("l_orderkey") === col("o_orderkey"))
      .join(t("customer"), col("o_custkey") === col("c_custkey"))
      .join(t("supplier"), col("l_suppkey") === col("s_suppkey"))
      .select(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
    val seeds = t("nation")
      .filter(pmod(col("n_nationkey"), lit(5)) === 0)
      .select(col("n_nationkey").as("node"))
    PageRank.personalized(edges, seeds, iters = 5)
      .select(col("node"), round(col("rank"), 6).as("rank"))
      .orderBy(col("node"))
  }

  private val q468Sql: String = {
    val base =
      """WITH e AS (
           SELECT DISTINCT c_nationkey AS src, s_nationkey AS dst
           FROM lineitem
           JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN supplier ON l_suppkey = s_suppkey),
         nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
         od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
         sd AS (SELECT n_nationkey AS node FROM nation
                WHERE n_nationkey % 5 = 0
                  AND n_nationkey IN (SELECT node FROM nodes)),
         ns AS (SELECT count(*)::DOUBLE AS n FROM sd),
         tp AS MATERIALIZED (
           SELECT nodes.node,
             CASE WHEN sd.node IS NOT NULL THEN 1.0::DOUBLE / ns.n
                  ELSE 0.0::DOUBLE END AS tp
           FROM nodes LEFT JOIN sd ON sd.node = nodes.node CROSS JOIN ns),
         pr0 AS (SELECT node, tp AS rank FROM tp)"""
    val iters = (1 to 5).map { k =>
      s""",
         pr$k AS (
           SELECT t.node,
                  (1.0::DOUBLE - 0.85::DOUBLE) * t.tp
                  + 0.85::DOUBLE * coalesce(m.mass, 0::DOUBLE) AS rank
           FROM tp t LEFT JOIN (
             SELECT e.dst AS node, sum(p.rank / od.outdeg) AS mass
             FROM pr${k - 1} p
             JOIN e ON p.node = e.src
             JOIN od ON e.src = od.src
             GROUP BY 1) m ON t.node = m.node)"""
    }.mkString
    base + iters +
      "\n       SELECT node, round(rank, 6) AS rank FROM pr5 ORDER BY node"
  }

  // --------------------------------------------------------------- q469
  /** TIER-BALANCED SHARDS — the loader-side consumer of the q458
    * curriculum: within each difficulty tier, documents deal
    * round-robin (pos mod 8) across 8 shards, so every shard carries
    * an equal difficulty profile (per-(shard, tier) counts differ by
    * at most 1 BY CONSTRUCTION — the audit columns prove it). This is
    * what makes distributed training see the curriculum: any shard
    * subset preserves the difficulty mix. */
  private def q469(s: SparkSession, dir: String): DataFrame = {
    val Shards = 8
    Curriculum.interleave(
        docs(s, dir).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", tiers = 4)
      .select(pmod(col("pos"), lit(Shards)).as("shard"), col("tier"))
      .groupBy(col("shard"), col("tier"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("shard"), col("tier"))
  }

  private val q469Sql: String =
    s"""WITH idx AS (
         SELECT doc_id,
           ROW_NUMBER() OVER (ORDER BY n_chars, doc_id) - 1 AS idx,
           COUNT(*) OVER () AS n
         FROM documents),
       t AS (SELECT doc_id, idx, n, (idx * 4) // n AS tier FROM idx),
       p AS (SELECT doc_id, tier, idx - (tier * n + 3) // 4 AS pos FROM t)
       SELECT CAST(pos % 8 AS BIGINT) AS shard, CAST(tier AS BIGINT) AS tier,
         count(*) AS n_docs
       FROM p GROUP BY 1, 2 ORDER BY shard, tier"""

  // --------------------------------------------------------------- q470
  /** CONTRASTIVE-PREP FUNNEL REPORT — the one-page manifest a training
    * run signs off on before consuming this session's pair tables
    * (the q64/q449 funnel-report pattern, for the contrastive loop):
    * corpus volume, ICT pairs with non-empty context, anchor pool,
    * anchors that actually mined an in-band negative, assembled
    * triplets (negative ∧ same-label positive exists), and the
    * preference-pair yield. Each stage is one bounded aggregate over a
    * component this pack oracles individually. */
  private def q470(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.TextFunctions
    def stage(name: String, df: DataFrame): DataFrame =
      df.agg(count(lit(1)).as("n")).select(lit(name).as("stage"), col("n"))
    val d = docs(s, dir)
    val all = emb(s, dir)
    val anchors = all.filter(pmod(col("vec_id"), lit(25)) === 0)
    val ictCtx = d.filter(size(TextFunctions.tokens(col("text"))) > 32)
    val negs = Similarity.hardNegatives(all, anchors, "vec_id", "embedding",
        "label", k = 5, dim = Dim, loCos = 0.1, hiCos = 0.8)
      .select(col("query_id")).distinct()
    val posable = anchors.select(col("vec_id"), col("label").as("a_label"))
      .join(all.select(col("vec_id").as("o_id"), col("label").as("o_label")),
        col("a_label") === col("o_label") && col("vec_id") =!= col("o_id"),
        "left_semi")
      .select(col("vec_id").as("query_id"))
    val triplets = negs.join(posable, "query_id")
    val prefs = Dedup.minhashDedupMd5(
      d.filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text")
    stage("1_docs_total", d)
      .unionByName(stage("2_ict_with_context", ictCtx))
      .unionByName(stage("3_anchors", anchors))
      .unionByName(stage("4_anchors_with_negative", negs))
      .unionByName(stage("5_triplets", triplets))
      .unionByName(stage("6_preference_pairs", prefs))
      .orderBy(col("stage"))
  }

  private val q470Sql: String = {
    val bits = 16
    val bands = 4
    val r = bits / bands
    val mask = (1 << r) - 1
    val sigExpr = OracleVec.sigExprSql(bits)
    s"""WITH ${OracleSketch.minhashCtes("doc_id % 5 = 0")},
       sigs AS (
         SELECT vec_id, label, CAST($sigExpr AS BIGINT) AS sig FROM embeddings),
       bands AS (
         SELECT vec_id, label, t.b AS band_idx, (sig >> ($r * t.b)) & $mask AS band_key
         FROM sigs, unnest(generate_series(0, ${bands - 1})) AS t(b)),
       cand AS (
         SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         FROM bands q JOIN bands c
           ON q.band_idx = c.band_idx AND q.band_key = c.band_key
         WHERE q.vec_id % 25 = 0 AND q.vec_id <> c.vec_id
           AND q.label <> c.label),
       scored AS (
         SELECT query_id, neighbor_id,
           ${dotSql("eq.embedding", "ec.embedding")} /
             (${normSql("eq.embedding")} * ${normSql("ec.embedding")}) AS cos
         FROM cand
         JOIN embeddings eq ON eq.vec_id = query_id
         JOIN embeddings ec ON ec.vec_id = neighbor_id),
       negs AS (
         SELECT DISTINCT query_id FROM scored
         WHERE cos >= 0.1e0 AND cos < 0.8e0),
       posable AS (
         SELECT DISTINCT a.vec_id AS query_id FROM embeddings a
         WHERE a.vec_id % 25 = 0 AND EXISTS (
           SELECT 1 FROM embeddings b
           WHERE b.label = a.label AND b.vec_id <> a.vec_id))
       SELECT stage, n FROM (
         SELECT '1_docs_total' AS stage, count(*) AS n FROM documents
         UNION ALL
         SELECT '2_ict_with_context',
           (SELECT count(*) FROM documents
            WHERE len(regexp_split_to_array(trim(text), '\\s+')) > 32)
         UNION ALL
         SELECT '3_anchors',
           (SELECT count(*) FROM embeddings WHERE vec_id % 25 = 0)
         UNION ALL
         SELECT '4_anchors_with_negative', (SELECT count(*) FROM negs)
         UNION ALL
         SELECT '5_triplets',
           (SELECT count(*) FROM negs JOIN posable USING (query_id))
         UNION ALL
         SELECT '6_preference_pairs',
           (SELECT count(*) FROM mh_est WHERE e >= 0.2))
       ORDER BY stage"""
  }

  // --------------------------------------------------------------- q471
  /** PERPLEXITY CURRICULUM — q458's schedule with the REAL difficulty
    * signal: per-doc Kneser-Ney avg-NLL ([[graft.operators.KnLm]],
    * q437's model) ranks documents fluent→surprising, then the same
    * equi-depth tier + round-robin interleave (the CCNet "order by LM
    * perplexity" recipe made a deterministic schedule). The 6-dp
    * rounding happens BEFORE the rank so the RowIndexer total order
    * is engine-exact; docs with < 2 alpha tokens have no bigrams and
    * are absent, exactly like q437. */
  private def q471(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.KnLm
    val d = docs(s, dir)
    // ONE tokenize + bigram-explode pass feeds fit AND score (q437's
    // same-corpus sharing)
    val db = KnLm.docBigrams(d, "doc_id", "text").localCheckpoint()
    val model = KnLm.fitFromBigrams(db)
    val diff = KnLm.scoreFromBigrams(db, "doc_id", model)
      .select(col("doc_id"), round(col("avg_nll"), 6).as("diff"))
    Curriculum.interleave(diff, "doc_id", "diff", tiers = 4)
      .select(col("doc_id"), col("diff"), col("tier"), col("pos"), col("ord"))
      .orderBy(col("ord"))
  }

  private val q471Sql: String =
    s"""WITH ${OracleKn.perDocCtes},
       diff AS (
         SELECT doc_id, round(nllsum / n_bigrams, 6) AS diff FROM per_doc),
       idx AS (
         SELECT doc_id, diff,
           ROW_NUMBER() OVER (ORDER BY diff, doc_id) - 1 AS idx,
           COUNT(*) OVER () AS n
         FROM diff),
       t AS (SELECT doc_id, diff, idx, n, (idx * 4) // n AS tier FROM idx),
       p AS (SELECT doc_id, diff, tier,
               idx - (tier * n + 3) // 4 AS pos FROM t)
       SELECT doc_id, diff, CAST(tier AS BIGINT) AS tier,
         CAST(pos AS BIGINT) AS pos, CAST(pos * 4 + tier AS BIGINT) AS ord
       FROM p ORDER BY ord"""

  override val queries: Map[String, QueryFn] = Map(
    "q456_hard_negatives"      -> q456 _,
    "q457_margin_bitext"       -> q457 _,
    "q458_curriculum_interleave" -> q458 _,
    "q459_ict_pairs"           -> q459 _,
    "q460_training_triplets"   -> q460 _,
    "q461_dedup_agreement"     -> q461 _,
    "q462_kmv_overlap"         -> q462 _,
    "q463_margin_bitext_srp"   -> q463 _,
    "q464_hubness_audit"       -> q464 _,
    "q465_preference_pairs"    -> q465 _,
    "q466_mutual_bitext"       -> q466 _,
    "q467_ablation_mixes"      -> q467 _,
    "q468_personalized_pagerank" -> q468 _,
    "q469_tier_balanced_shards" -> q469 _,
    "q470_contrastive_funnel"  -> q470 _,
    "q471_perplexity_curriculum" -> q471 _)

  override val oracles: Map[String, String] = Map(
    "q456_hard_negatives"      -> q456Sql,
    "q457_margin_bitext"       -> q457Sql,
    "q458_curriculum_interleave" -> q458Sql,
    "q459_ict_pairs"           -> q459Sql,
    "q460_training_triplets"   -> q460Sql,
    "q461_dedup_agreement"     -> q461Sql,
    "q462_kmv_overlap"         -> q462Sql,
    "q463_margin_bitext_srp"   -> q463Sql,
    "q464_hubness_audit"       -> q464Sql,
    "q465_preference_pairs"    -> q465Sql,
    "q466_mutual_bitext"       -> q466Sql,
    "q467_ablation_mixes"      -> q467Sql,
    "q468_personalized_pagerank" -> q468Sql,
    "q469_tier_balanced_shards" -> q469Sql,
    "q470_contrastive_funnel"  -> q470Sql,
    "q471_perplexity_curriculum" -> q471Sql)
}
