package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.Dedup

/** Text-analysis coverage over `documents` — the training-data-pipeline
  * operator family (token counting, quality scoring, language-ID,
  * n-gram Jaccard, fingerprinting, MinHash/SimHash near-dup).
  *
  * MinHash (q26) and SimHash (q27) run the production pipeline code
  * with the md5 base-hash family (identical in DuckDB), so the driver
  * verifies the full sketch pipelines end-to-end; the xxhash64 scale
  * defaults of the same code paths are pinned by DedupSpec/TextSpec
  * against exact Jaccard / hamming on planted near-duplicates.
  */
object Text extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("documents")

  // Shared DuckDB fragments (exact twins of TextFunctions helpers).
  private val toksSql = "regexp_split_to_array(trim(text), '\\s+')"

  // ---------------------------------------------------------------- q21
  /** Token counting — whitespace tokens + BPE-ish lexer tokens,
    * aggregated per language. One pass, all regex work codegen'd. */
  private def q21(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("lang"),
        TextFunctions.tokenCount(col("text")).as("n_tok"),
        TextFunctions.bpeTokenCount(col("text")).as("n_bpe"),
        length(col("text")).as("n_chars"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("sum_tokens"),
        round(avg(col("n_tok")), 6).as("avg_tokens"),
        max(col("n_tok")).as("max_tokens"),
        sum(col("n_bpe")).as("sum_bpe_tokens"),
        round(avg(col("n_chars")), 6).as("avg_chars"))
      .orderBy(col("lang"))

  private val q21Sql =
    s"""SELECT lang, count(*) AS n_docs,
       CAST(sum(len($toksSql)) AS BIGINT) AS sum_tokens,
       round(avg(len($toksSql)), 6) AS avg_tokens,
       CAST(max(len($toksSql)) AS INT) AS max_tokens,
       CAST(sum(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS sum_bpe_tokens,
       round(avg(length(text)), 6) AS avg_chars
       FROM documents GROUP BY lang ORDER BY lang"""

  // ---------------------------------------------------------------- q22
  /** Quality scoring — per-doc length/punct/stopword/avg-token-length
    * features and a thresholded keep/flag verdict. */
  private def q22(s: SparkSession, dir: String): DataFrame = {
    val toks = TextFunctions.tokens(col("text"))
    val nTok = size(toks)
    val stop = TextFunctions.stopwordCount(toks, Seq("the", "a", "of", "to", "and"))
    docs(s, dir)
      .select(
        col("doc_id"),
        nTok.as("n_tokens"),
        length(col("text")).as("n_chars"),
        round(TextFunctions.punctCount(col("text")).cast("double") /
              greatest(length(col("text")), lit(1)), 6).as("punct_ratio"),
        round(stop.cast("double") / greatest(nTok, lit(1)), 6).as("stopword_ratio"),
        round(TextFunctions.nonSpaceCharCount(col("text")).cast("double") /
              greatest(nTok, lit(1)), 6).as("avg_token_len"))
      .withColumn("verdict",
        when(col("n_tokens").between(20, 90) && col("stopword_ratio") <= 0.5, "keep")
          .otherwise("flag"))
      .orderBy(col("doc_id"))
  }

  private val q22Sql =
    s"""WITH f AS (
       SELECT doc_id,
         CAST(len($toksSql) AS INT) AS n_tokens,
         CAST(length(text) AS INT) AS n_chars,
         round(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) * 1.0 /
               greatest(length(text), 1), 6) AS punct_ratio,
         round(len(list_filter($toksSql,
               t -> t IN ('the', 'a', 'of', 'to', 'and'))) * 1.0 /
               greatest(len($toksSql), 1), 6) AS stopword_ratio,
         round(length(regexp_replace(text, '\\s', '', 'g')) * 1.0 /
               greatest(len($toksSql), 1), 6) AS avg_token_len
       FROM documents)
       SELECT doc_id, n_tokens, n_chars, punct_ratio, stopword_ratio, avg_token_len,
         CASE WHEN n_tokens BETWEEN 20 AND 90 AND stopword_ratio <= 0.5
              THEN 'keep' ELSE 'flag' END AS verdict
       FROM f ORDER BY doc_id"""

  // ---------------------------------------------------------------- q23
  /** Language-ID heuristic — marker-stopword argmax + CJK char check,
    * confusion counts per actual label. */
  private def q23(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("lang"), TextFunctions.predictLang(col("text")).as("predicted_lang"))
      .groupBy(col("lang"), col("predicted_lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted_lang"))

  private val q23Sql = {
    val lt = s"regexp_split_to_array(trim(lower(text)), '\\s+')"
    def score(ws: Seq[String]) =
      s"len(list_filter($lt, t -> t IN (${ws.map(w => s"'$w'").mkString(", ")})))"
    val sEn = score(Seq("the", "a", "of", "to"))
    val sDe = score(Seq("der", "die", "das", "und"))
    val sEs = score(Seq("el", "los", "las", "y"))
    val sFr = score(Seq("le", "les", "et", "une"))
    s"""WITH p AS (
       SELECT lang,
         CASE WHEN length(regexp_replace(text, '[^\\x{4e00}-\\x{9fff}]', '', 'g')) > 0 THEN 'zh'
              WHEN $sEn >= greatest($sDe, $sEs, $sFr) THEN 'en'
              WHEN $sDe >= greatest($sEs, $sFr) THEN 'de'
              WHEN $sEs >= $sFr THEN 'es'
              ELSE 'fr' END AS predicted_lang
       FROM documents)
       SELECT lang, predicted_lang, count(*) AS n_docs
       FROM p GROUP BY lang, predicted_lang ORDER BY lang, predicted_lang"""
  }

  // ---------------------------------------------------------------- q24
  /** n-gram Jaccard similarity — word-3-gram shingle overlap between
    * same-source doc pairs (subsampled doc_id%5), top-50 pairs. The
    * shingle self-join is the scalable shape: pairs only materialize
    * for docs sharing at least one shingle, never all-pairs. */
  private def q24(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .filter(pmod(col("doc_id"), lit(5)) === 0)
      .select(col("doc_id"), col("source"),
              TextFunctions.tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"), col("source"),
              explode(TextFunctions.wordShingles(col("toks"), 3)).as("sh"))
    val cnt = base.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val pairs = base.as("a")
      .join(base.as("b"),
        col("a.sh") === col("b.sh") && col("a.source") === col("b.source") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("common"))
    pairs
      .join(cnt.as("ca"), col("doc_a") === col("ca.doc_id"))
      .join(cnt.as("cb"), col("doc_b") === col("cb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
              round(col("common") / (col("ca.n") + col("cb.n") - col("common")), 6)
                .as("jaccard"))
      .orderBy(col("jaccard").desc, col("doc_a"), col("doc_b"))
      .limit(50)
  }

  private val q24Sql =
    s"""WITH base AS (
         SELECT doc_id, source, $toksSql AS toks
         FROM documents WHERE doc_id % 5 = 0 AND len($toksSql) >= 3),
       sh AS (
         SELECT doc_id, source,
           unnest(list_distinct(list_transform(generate_series(1, len(toks) - 2),
             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS s
         FROM base),
       cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       pairs AS (
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
         FROM sh a JOIN sh b
           ON a.s = b.s AND a.source = b.source AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
       SELECT doc_a, doc_b,
         round(common * 1.0 / (ca.n + cb.n - common), 6) AS jaccard
       FROM pairs
       JOIN cnt ca ON doc_a = ca.doc_id
       JOIN cnt cb ON doc_b = cb.doc_id
       ORDER BY jaccard DESC, doc_a, doc_b LIMIT 50"""

  // ---------------------------------------------------------------- q25
  /** Document fingerprinting — md5 over whitespace-normalized text
    * (deterministic 128-bit content id; the exact-dedup key). */
  private def q25(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fingerprint"))
      .orderBy(col("doc_id"))

  private val q25Sql =
    """SELECT doc_id,
       md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fingerprint
       FROM documents ORDER BY doc_id"""

  // ---------------------------------------------------------------- q26
  /** MinHash+LSH near-dup candidates through the FULL production
    * pipeline (shingle → signature → banded LSH candidates → est-
    * Jaccard filter), run with the md5 base-hash family and raw-string
    * band keys so the DuckDB oracle reproduces the candidate set
    * exactly. The xxhash64 scale path (same code, fused signature
    * expression, hashed band keys) is pinned by DedupSpec/TextSpec. */
  private def q26(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashDedupMd5(
        docs(s, dir).filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text")
      .withColumn("est_jaccard", round(col("est_jaccard"), 6))
      .orderBy(col("id_a"), col("id_b"))

  // CTE bodies shared with the q461 agreement audit — see OracleSketch.
  private val q26Sql =
    s"""WITH ${OracleSketch.minhashCtes("doc_id % 5 = 0")}
       SELECT id_a, id_b, round(e, 6) AS est_jaccard
       FROM mh_est WHERE e >= 0.2 ORDER BY id_a, id_b"""

  // ---------------------------------------------------------------- q27
  /** SimHash near-dup pairs through the FULL production pipeline
    * (per-token hash → bit votes → packed signature → chunk candidates
    * → hamming filter), on the 32-bit md5-family signature (4×8-bit
    * chunks — 256 buckets per chunk keeps the candidate join far from
    * all-pairs; hamming <= 6, the production 12/64 ratio) so the
    * DuckDB oracle reproduces it end-to-end. The 64-bit xxhash64 scale
    * path (fused SimHash64 expression) is pinned by DedupSpec. */
  private def q27(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashDedupMd5(
        docs(s, dir).filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text")
      .orderBy(col("id_a"), col("id_b"))

  private val q27Sql =
    s"""WITH ${OracleSketch.simhashCtes("doc_id % 5 = 0")}
       SELECT id_a, id_b, CAST(hamming AS INT) AS hamming
       FROM sh_ham WHERE hamming <= 6
       ORDER BY id_a, id_b"""

  // --------------------------------------------------------- q343/q344
  /** The PRODUCTION xxhash64 sketch pipelines, driver-benched on the
    * FULL documents table (no sample): fused MinHashSignature /
    * SimHash64 expressions, hashed band keys — the 100 TB shape. DuckDB
    * has no Spark-compatible xxhash64, so the oracle is a committed
    * golden-parquet compare (golden/<query>/sf<sf>.parquet, regenerated
    * only via tools.RegenGoldens, freshness pinned every `sbt test` by
    * GoldenScaleSpec) dispatched on the lineitem row count — testdata is
    * deterministic (seed=42, read-only), so the snapshot is stable. The
    * math is additionally pinned three ways: DedupSpec equivalences, the
    * md5-family twins (q26/q27, true recomputed oracles), and q43/q44's
    * signature-level oracles. Registering them keeps the benched numbers
    * on the scale path — r5 benched only the md5 twin, 6× the cost. */
  /** LSH parameters are tuned to the DEDUP target, not the q26 demo
    * shape: near-dup removal wants τ ≈ 0.8, and with r = 4 any pair at
    * J ≈ 0.5 expects a band collision (16 · 0.5⁴ ≈ 1) — on this highly
    * self-similar corpus that made candidates ~3.5% of ALL pairs (435k
    * at sf0.1, 12 s). r = 8 drops P(collide | J = 0.5) to 8 · 0.004 ≈
    * 3%, so candidate volume tracks true near-dups — the parameter
    * choice IS the scale design. */
  private def q343(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashDedup(docs(s, dir), "doc_id", "text",
        k = 64, bands = 8, threshold = 0.8)
      .withColumn("est_jaccard", round(col("est_jaccard"), 6))
      .orderBy(col("id_a"), col("id_b"))

  private def q344(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashDedup(docs(s, dir), "doc_id", "text", maxHamming = 3)
      .orderBy(col("id_a"), col("id_b"))

  private val q343Sql =
    GoldenOracle.sql("q343_minhash_scale", "id_a, id_b, est_jaccard", "id_a, id_b")
  private val q344Sql =
    GoldenOracle.sql("q344_simhash_scale", "id_a, id_b, hamming", "id_a, id_b")

  override val queries: Map[String, QueryFn] = Map(
    "q21_token_stats"    -> q21 _,
    "q22_text_quality"   -> q22 _,
    "q23_lang_id"        -> q23 _,
    "q24_ngram_jaccard"  -> q24 _,
    "q25_fingerprint"    -> q25 _,
    "q26_minhash_lsh"    -> q26 _,
    "q27_simhash"        -> q27 _,
    "q343_minhash_scale" -> q343 _,
    "q344_simhash_scale" -> q344 _)

  override val oracles: Map[String, String] = Map(
    "q21_token_stats"    -> q21Sql,
    "q22_text_quality"   -> q22Sql,
    "q23_lang_id"        -> q23Sql,
    "q24_ngram_jaccard"  -> q24Sql,
    "q25_fingerprint"    -> q25Sql,
    "q26_minhash_lsh"    -> q26Sql,
    "q27_simhash"        -> q27Sql,
    "q343_minhash_scale" -> q343Sql,
    "q344_simhash_scale" -> q344Sql)
}
