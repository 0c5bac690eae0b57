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
  * MinHash and SimHash have no SQL oracle (their hash families aren't
  * expressible in DuckDB) — the driver records rows-only checks and
  * TextSpec pins their semantics against exact Jaccard / hamming on
  * planted near-duplicates.
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
  /** MinHash+LSH near-dup candidates (char-5-gram shingles, k=64,
    * 16 bands × 4 rows, est-Jaccard >= 0.2). No SQL oracle — rows-only
    * check here; semantics pinned in TextSpec. */
  private def q26(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashDedup(
        docs(s, dir).filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text")
      .withColumn("est_jaccard", round(col("est_jaccard"), 6))
      .orderBy(col("id_a"), col("id_b"))

  // ---------------------------------------------------------------- q27
  /** SimHash near-dup pairs (64-bit, 4×16-bit chunk candidates,
    * hamming <= 12 — calibrated so unrelated same-vocab docs stay
    * apart while shared-prefix docs pair up). Rows-only check. */
  private def q27(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashDedup(
        docs(s, dir).filter(pmod(col("doc_id"), lit(5)) === 0), "doc_id", "text",
        maxHamming = 12)
      .orderBy(col("id_a"), col("id_b"))

  override val queries: Map[String, QueryFn] = Map(
    "q21_token_stats"    -> q21 _,
    "q22_text_quality"   -> q22 _,
    "q23_lang_id"        -> q23 _,
    "q24_ngram_jaccard"  -> q24 _,
    "q25_fingerprint"    -> q25 _,
    "q26_minhash_lsh"    -> q26 _,
    "q27_simhash"        -> q27 _)

  override val oracles: Map[String, String] = Map(
    "q21_token_stats"    -> q21Sql,
    "q22_text_quality"   -> q22Sql,
    "q23_lang_id"        -> q23Sql,
    "q24_ngram_jaccard"  -> q24Sql,
    "q25_fingerprint"    -> q25Sql)
}
