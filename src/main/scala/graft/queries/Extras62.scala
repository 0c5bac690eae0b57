package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Similarity, SubstringDedup, Winnowing}

/** Round-8 pack, part 5: winnowing fingerprints (q396), hybrid
  * retrieval with reciprocal-rank fusion (q397), a per-source
  * curriculum schedule (q398), and the cross-source gram containment
  * matrix (q399).
  */
object Extras62 extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("documents")

  /** House tokenizer + distinct-token list, shared by q397/q398/q399
    * oracles. */
  private val toksCte =
    """toks AS (
         SELECT doc_id, source,
                list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '') AS t
         FROM documents)"""

  // --------------------------------------------------------------- q396
  /** Winnowing fingerprint profile ([[graft.operators.Winnowing]],
    * Schleimer et al. SIGMOD 2003): per document the k-gram count,
    * window count, selected-minimum count, distinct fingerprint count,
    * selection density (expected ~2/(w+1)), and fingerprint extrema.
    * Pure map-side array math — ZERO shuffles before the output sort;
    * the rightmost-min tie-break rides the h·2³¹+(2³¹−i) packing so
    * one array_min per window does hash-then-position comparison. */
  private def q396(s: SparkSession, dir: String): DataFrame =
    // Spread-guarded input: the winnowing gram-hash + window-min math
    // is the expensive projection that serializes on an under-split
    // scan (guide §2.5); the operator itself stays zero-shuffle
    Winnowing.profile(graft.operators.Spread.byKey(docs(s, dir),
        col("doc_id")), "doc_id", "text", k = 4, w = 4)
      .orderBy("doc_id")

  private val q396Sql = {
    val K = 4; val W = 4; val Sh = Winnowing.Shift
    s"""WITH $toksCte,
       g AS (
         SELECT doc_id,
           list_transform(generate_series(1, len(t) - ${K - 1}),
             i -> ('0x' || substring(md5(array_to_string(t[i:i + ${K - 1}],
                     ' ')), 1, 8))::BIGINT * $Sh + ($Sh - i)) AS c
         FROM toks WHERE len(t) >= ${K + W - 1}),
       m AS (
         SELECT doc_id, len(c) AS ng,
           list_distinct(list_transform(generate_series(1, len(c) - ${W - 1}),
             j -> list_min(c[j:j + ${W - 1}]))) AS sel
         FROM g),
       f AS (
         SELECT doc_id, ng, sel,
           list_distinct(list_transform(sel, x -> x // $Sh)) AS fps
         FROM m)
       SELECT doc_id,
              CAST(ng AS BIGINT) AS n_grams,
              CAST(ng - ${W - 1} AS BIGINT) AS n_windows,
              CAST(len(sel) AS BIGINT) AS n_selected,
              CAST(len(fps) AS BIGINT) AS n_fp,
              round(len(sel) / (ng - ${W - 1}.0), 6) AS sel_density,
              CAST(list_min(fps) AS BIGINT) AS min_fp,
              CAST(list_max(fps) AS BIGINT) AS max_fp
       FROM f ORDER BY doc_id"""
  }

  // --------------------------------------------------------------- q397
  /** Hybrid retrieval with reciprocal-rank fusion (Cormack et al.
    * SIGIR 2009): a lexical ranking (distinct-token Jaccard, top-20)
    * and a semantic ranking (embedding cosine via
    * [[Similarity.bruteForceTopK]], top-20) fused per query as
    * Σ 1/(60 + rank) over the lists the candidate appears in, top-10
    * kept. doc_id and vec_id are the synthetic 1:1 document↔embedding
    * link. 100 TB shape: the 5-query side broadcasts into both
    * retrievers; each ranking is one partitioned window over its
    * scored candidates; the fusion is a full-outer join of two
    * query-keyed top-20 lists — tiny by construction. Ranks are
    * integers, so the fused score is two exact-reciprocal terms summed
    * in a fixed order — deterministic across engines. */
  private def q397(s: SparkSession, dir: String): DataFrame = {
    val L = 20
    val tok = docs(s, dir).select(col("doc_id"),
      array_distinct(SubstringDedup.tokens(col("text"))).as("ts"))
    val q = tok.filter(col("doc_id") < 5)
      .select(col("doc_id").as("query_id"), col("ts").as("qts"))
    val cand = tok.join(broadcast(q), col("query_id") =!= col("doc_id"))
      .select(col("query_id"), col("doc_id").as("neighbor_id"),
        size(array_intersect(col("ts"), col("qts"))).as("shared"),
        size(col("ts")).as("na"), size(col("qts")).as("nb"))
      .withColumn("jacc", col("shared").cast("double") /
        (col("na") + col("nb") - col("shared")))
    val wl = Window.partitionBy("query_id")
      .orderBy(col("jacc").desc, col("neighbor_id"))
    val lex = cand.withColumn("lex_rank", row_number().over(wl))
      .filter(col("lex_rank") <= L)
      .select(col("query_id"), col("neighbor_id"),
        col("lex_rank").cast("long").as("lex_rank"))
    val emb = Tables(s, dir)("embeddings")
    val sem = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 5),
        "vec_id", "embedding", L)
      .select(col("query_id"), col("neighbor_id"),
        col("rank").cast("long").as("sem_rank"))
    val fused = lex.join(sem, Seq("query_id", "neighbor_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
        coalesce(lit(1.0) / (lit(60) + col("sem_rank")), lit(0.0)), 6))
    val wf = Window.partitionBy("query_id")
      .orderBy(col("rrf").desc, col("neighbor_id"))
    fused.withColumn("fused_rank", row_number().over(wf))
      .filter(col("fused_rank") <= 10)
      .select(col("query_id"), col("neighbor_id"), col("lex_rank"),
        col("sem_rank"), col("rrf"),
        col("fused_rank").cast("long").as("fused_rank"))
      .orderBy("query_id", "fused_rank")
  }

  private val q397Sql = {
    import OracleVec.{dotSql, normSql}
    s"""WITH $toksCte,
       td AS MATERIALIZED (SELECT doc_id, list_distinct(t) AS ts FROM toks),
       q AS (SELECT doc_id AS query_id, ts AS qts FROM td WHERE doc_id < 5),
       cand AS (
         SELECT q.query_id, td.doc_id AS neighbor_id,
                len(list_intersect(td.ts, q.qts)) AS shared,
                len(td.ts) AS na, len(q.qts) AS nb
         FROM td JOIN q ON td.doc_id <> q.query_id),
       lex AS (
         SELECT query_id, neighbor_id, CAST(lex_rank AS BIGINT) AS lex_rank
         FROM (
           SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY CAST(shared AS DOUBLE) / (na + nb - shared) DESC,
                             neighbor_id) AS lex_rank
           FROM cand)
         WHERE lex_rank <= 20),
       eq AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5),
       cos AS (
         SELECT eq.vec_id AS query_id, e.vec_id AS neighbor_id,
           CASE WHEN ${normSql("eq.embedding")} * ${normSql("e.embedding")} = 0
                THEN 0.0
                ELSE ${dotSql("eq.embedding", "e.embedding")} /
                  (${normSql("eq.embedding")} * ${normSql("e.embedding")})
           END AS c
         FROM eq JOIN embeddings e ON e.vec_id <> eq.vec_id),
       sem AS (
         SELECT query_id, neighbor_id, CAST(rk AS BIGINT) AS sem_rank
         FROM (
           SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                    ORDER BY c DESC, neighbor_id) AS rk
           FROM cos)
         WHERE rk <= 20),
       fused AS (
         SELECT coalesce(lex.query_id, sem.query_id) AS query_id,
                coalesce(lex.neighbor_id, sem.neighbor_id) AS neighbor_id,
                lex.lex_rank, sem.sem_rank
         FROM lex FULL JOIN sem
           ON lex.query_id = sem.query_id
          AND lex.neighbor_id = sem.neighbor_id),
       sc AS (
         SELECT *, round(coalesce(1.0 / (60 + lex_rank), 0) +
                         coalesce(1.0 / (60 + sem_rank), 0), 6) AS rrf
         FROM fused)
       SELECT query_id, neighbor_id, lex_rank, sem_rank, rrf,
              CAST(fr AS BIGINT) AS fused_rank
       FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                         ORDER BY rrf DESC, neighbor_id) AS fr
             FROM sc)
       WHERE fr <= 10
       ORDER BY query_id, fused_rank"""
  }

  // --------------------------------------------------------------- q398
  /** Per-source curriculum schedule: documents bucketed into 4 stages
    * by mean token length (a standard easy→hard difficulty proxy) via
    * ntile over (score, doc_id) WITHIN each source — the partitioned
    * window scales by source where a global ntile would funnel the
    * corpus through one partition (for a single giant source, compute
    * stage boundaries from exact quantiles and assign by range
    * comparison instead). Group stats are exact integer sums with ONE
    * final division each, so no float-summation order leaks in. */
  private def q398(s: SparkSession, dir: String): DataFrame = {
    val scored = docs(s, dir)
      .select(col("source"), col("doc_id"),
        SubstringDedup.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 1)
      .select(col("source"), col("doc_id"),
        size(col("toks")).as("n_toks"),
        aggregate(transform(col("toks"), t => length(t)), lit(0),
          (acc, x) => acc + x).as("chars"))
      .withColumn("score",
        col("chars").cast("double") / col("n_toks"))
    val w = Window.partitionBy("source")
      .orderBy(col("score"), col("doc_id"))
    scored.withColumn("stage", ntile(4).over(w).cast("long"))
      .groupBy(col("source"), col("stage"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        sum("n_toks").cast("long").as("n_tokens"),
        sum("chars").cast("long").as("n_chars"),
        round(min("score"), 6).as("min_score"),
        round(max("score"), 6).as("max_score"))
      .withColumn("mean_tok_len",
        round(col("n_chars").cast("double") / col("n_tokens"), 6))
      .select("source", "stage", "n_docs", "n_tokens", "n_chars",
        "mean_tok_len", "min_score", "max_score")
      .orderBy("source", "stage")
  }

  private val q398Sql =
    s"""WITH $toksCte,
       scored AS (
         SELECT source, doc_id, len(t) AS n_toks,
                list_sum(list_transform(t, x -> length(x))) AS chars,
                CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
                  / len(t) AS score
         FROM toks WHERE len(t) >= 1),
       st AS (
         SELECT source, doc_id, n_toks, chars, score,
                ntile(4) OVER (PARTITION BY source
                               ORDER BY score, doc_id) AS stage
         FROM scored)
       SELECT source, stage,
              CAST(count(*) AS BIGINT) AS n_docs,
              CAST(sum(n_toks) AS BIGINT) AS n_tokens,
              CAST(sum(chars) AS BIGINT) AS n_chars,
              round(CAST(sum(chars) AS DOUBLE) / sum(n_toks), 6)
                AS mean_tok_len,
              round(min(score), 6) AS min_score,
              round(max(score), 6) AS max_score
       FROM st GROUP BY source, stage ORDER BY source, stage"""

  // --------------------------------------------------------------- q399
  /** Cross-source gram containment matrix: for every ordered source
    * pair (a, b), the shared distinct word-8-gram count, each side's
    * distinct gram count, containment of b in a (shared/|b| — "how
    * much of b is already in a", the keep/drop signal when merging
    * crawl sources), and Jaccard. The full matrix survives zero-overlap
    * pairs via the cross join of the tiny per-source count relation.
    * 100 TB shape: ONE distinct over (source, 64-bit gram key), one
    * gram-keyed equi-join whose per-gram fan-out is bounded by the
    * source count, and an S²-row output. */
  private def q399(s: SparkSession, dir: String): DataFrame = {
    val K = 8
    val g = docs(s, dir)
      .select(col("source"), SubstringDedup.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= K)
      .select(col("source"),
        explode(transform(sequence(lit(1), size(col("t")) - (K - 1)), i =>
          SubstringDedup.md5Gram(
            concat_ws(" ", slice(col("t"), i, lit(K)))))).as("gram"))
      .distinct()
    val cnt = g.groupBy("source").agg(count(lit(1)).as("n"))
    val shared = g.as("a")
      .join(g.as("b"),
        col("a.gram") === col("b.gram") && col("a.source") =!= col("b.source"))
      .groupBy(col("a.source").as("src_a"), col("b.source").as("src_b"))
      .agg(count(lit(1)).as("sh"))
    val pairs = cnt.as("ca").select(col("source").as("src_a"), col("n").as("n_a"))
      .crossJoin(cnt.as("cb").select(col("source").as("src_b"), col("n").as("n_b")))
      .filter(col("src_a") =!= col("src_b"))
    pairs.join(shared, Seq("src_a", "src_b"), "left")
      .withColumn("shared_grams", coalesce(col("sh"), lit(0L)).cast("long"))
      .select(col("src_a"), col("src_b"), col("shared_grams"),
        col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
        round(col("shared_grams").cast("double") / col("n_b"), 6)
          .as("containment"),
        round(col("shared_grams").cast("double") /
          (col("n_a") + col("n_b") - col("shared_grams")), 6).as("jaccard"))
      .orderBy("src_a", "src_b")
  }

  private val q399Sql = {
    val K = 8
    s"""WITH $toksCte,
       g AS MATERIALIZED (
         SELECT DISTINCT source,
                substring(md5(array_to_string(t[i:i + ${K - 1}], ' ')), 1, 16)
                  AS gram
         FROM toks, unnest(generate_series(1, len(t) - ${K - 1})) AS u(i)
         WHERE len(t) >= $K),
       cnt AS MATERIALIZED (SELECT source, count(*) AS n FROM g GROUP BY 1),
       sh AS (
         SELECT a.source AS src_a, b.source AS src_b, count(*) AS sh
         FROM g a JOIN g b ON a.gram = b.gram AND a.source <> b.source
         GROUP BY 1, 2),
       pairs AS (
         SELECT ca.source AS src_a, cb.source AS src_b,
                ca.n AS n_a, cb.n AS n_b
         FROM cnt ca CROSS JOIN cnt cb WHERE ca.source <> cb.source)
       SELECT src_a, src_b,
              CAST(coalesce(sh.sh, 0) AS BIGINT) AS shared_grams,
              CAST(n_a AS BIGINT) AS n_a,
              CAST(n_b AS BIGINT) AS n_b,
              round(coalesce(sh.sh, 0) * 1.0 / n_b, 6) AS containment,
              round(coalesce(sh.sh, 0) * 1.0 / (n_a + n_b - coalesce(sh.sh, 0)),
                    6) AS jaccard
       FROM pairs LEFT JOIN sh USING (src_a, src_b)
       ORDER BY src_a, src_b"""
  }

  // --------------------------------------------------------------- q407
  /** Winnowing MATCH pairs — the use the fingerprints exist for (the
    * MOSS plagiarism-candidate table): document pairs sharing >= 2
    * selected fingerprints, with each side's fingerprint-set size and
    * the overlap fraction vs the smaller set. The fingerprint
    * equi-join rides [[graft.operators.Dedup.dropHotBuckets]] (cap
    * 50) exactly like every banded-LSH path — a boilerplate
    * fingerprint shared by B docs would otherwise emit B²/2 pairs.
    * Denominators use the UNCAPPED per-doc counts (the cap prunes the
    * join, not the truth). Top-50 under a total order. */
  private def q407(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.{Dedup, Spread}
    // materialized ONCE: the fingerprint relation feeds the per-doc
    // counts, the hot-bucket rollup, the anti-join, and BOTH sides of
    // the pair self-join — without the checkpoint the whole winnowing
    // gram-hash + window-min computation re-ran for each of those five
    // plan appearances. Spread-guarded for the same §2.5 reason as q396.
    val fps = Winnowing.fingerprints(
        Spread.byKey(docs(s, dir), col("doc_id")), "doc_id", "text",
        k = 4, w = 4)
      .localCheckpoint()
    val perDoc = fps.groupBy("doc_id").agg(count(lit(1)).as("nf"))
    val capped = Dedup.dropHotBuckets(fps, Seq("fp"), maxBucket = 50)
    val a = capped.select(col("doc_id").as("id_a"), col("fp"))
    val b = capped.select(col("doc_id").as("id_b"), col("fp"))
    val pairs = a.join(b, Seq("fp")).filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .filter(col("shared") >= 2)
    pairs
      .join(perDoc.select(col("doc_id").as("id_a"), col("nf").as("nf_a")),
        Seq("id_a"))
      .join(perDoc.select(col("doc_id").as("id_b"), col("nf").as("nf_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("shared").cast("long").as("shared"),
        col("nf_a").cast("long").as("nf_a"), col("nf_b").cast("long").as("nf_b"),
        round(col("shared").cast("double") / least(col("nf_a"), col("nf_b")), 6)
          .as("overlap"))
      .orderBy(col("shared").desc, col("id_a"), col("id_b"))
      .limit(50)
  }

  private val q407Sql = {
    val K = 4; val W = 4; val Sh = Winnowing.Shift
    s"""WITH $toksCte,
       g AS (
         SELECT doc_id,
           list_transform(generate_series(1, len(t) - ${K - 1}),
             i -> ('0x' || substring(md5(array_to_string(t[i:i + ${K - 1}],
                     ' ')), 1, 8))::BIGINT * $Sh + ($Sh - i)) AS c
         FROM toks WHERE len(t) >= ${K + W - 1}),
       m AS (
         SELECT doc_id,
           list_distinct(list_transform(
             list_distinct(list_transform(generate_series(1, len(c) - ${W - 1}),
               j -> list_min(c[j:j + ${W - 1}]))),
             x -> x // $Sh)) AS fps
         FROM g),
       fp AS MATERIALIZED (
         SELECT doc_id, u.fp FROM m, unnest(fps) AS u(fp)),
       per_doc AS MATERIALIZED (SELECT doc_id, count(*) AS nf FROM fp GROUP BY 1),
       hot AS (SELECT fp FROM fp GROUP BY fp HAVING count(*) > 50),
       capped AS MATERIALIZED (SELECT doc_id, fp FROM fp ANTI JOIN hot USING (fp)),
       pairs AS (
         SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
         FROM capped a JOIN capped b
           ON a.fp = b.fp AND a.doc_id < b.doc_id
         GROUP BY 1, 2 HAVING count(*) >= 2)
       SELECT id_a, id_b, CAST(shared AS BIGINT) AS shared,
              CAST(pa.nf AS BIGINT) AS nf_a, CAST(pb.nf AS BIGINT) AS nf_b,
              round(shared * 1.0 / least(pa.nf, pb.nf), 6) AS overlap
       FROM pairs JOIN per_doc pa ON pa.doc_id = id_a
                  JOIN per_doc pb ON pb.doc_id = id_b
       ORDER BY shared DESC, id_a, id_b LIMIT 50"""
  }

  override def queries: Map[String, QueryFn] = Map(
    "q396_winnowing" -> q396 _,
    "q397_rrf_fusion" -> q397 _,
    "q398_curriculum" -> q398 _,
    "q399_source_containment" -> q399 _,
    "q407_winnow_matches" -> q407 _)

  override def oracles: Map[String, String] = Map(
    "q396_winnowing" -> q396Sql,
    "q397_rrf_fusion" -> q397Sql,
    "q398_curriculum" -> q398Sql,
    "q399_source_containment" -> q399Sql,
    "q407_winnow_matches" -> q407Sql)
}
