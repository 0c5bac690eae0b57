package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 curation surface: Gopher-style repetition quality signals,
  * URL canonicalization + per-domain capping, training-chunk splitting,
  * and embedding normalization/int8 quantization. All DuckDB-oracled.
  */
object Curation3 extends QueryPack {

  // --------------------------------------------------------------- q112
  /** Repetition-based quality signals (the Gopher/MassiveText rules):
    * per document, the fraction of duplicate word-2-grams and the mass
    * of the single most frequent 2-gram; rolled up per language with a
    * flag-rate for heavily repetitive docs. Shuffles on (doc, gram) with
    * map-side combine — gram cardinality, not corpus size, bounds the
    * agg state, so the shape holds at 100 TB. */
  private def q112(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val ws = split(col("text"), " ")
    val grams = expr(
      "transform(sequence(1, size(ws) - 1), i -> concat(element_at(ws, i), ' ', element_at(ws, i + 1)))")
    val perGram = d.select(col("doc_id"), col("lang"), ws.as("ws"))
      .where(size(col("ws")) >= 2)
      .select(col("doc_id"), col("lang"), explode(grams).as("gram"))
      .groupBy(col("doc_id"), col("lang"), col("gram")).count()
    val perDoc = perGram.groupBy(col("doc_id"), col("lang"))
      .agg(sum(col("count")).as("n_grams"),
           count(lit(1)).as("n_distinct"),
           max(col("count")).as("top_n"))
      .select(col("doc_id"), col("lang"),
        (lit(1.0) - col("n_distinct") / col("n_grams")).as("dup_frac"),
        (col("top_n") / col("n_grams")).as("top_frac"))
    perDoc.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("dup_frac")), 6).as("avg_dup_frac"),
           round(avg(col("top_frac")), 6).as("avg_top_frac"),
           sum(when(col("dup_frac") > 0.5, 1L).otherwise(0L)).as("n_flagged"))
      .orderBy(col("lang"))
  }

  private val q112Sql =
    """WITH w AS (
         SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents),
       g AS (
         SELECT doc_id, lang, ws[i] || ' ' || ws[i + 1] AS gram
         FROM w, unnest(range(1, len(ws))) AS t(i)
         WHERE len(ws) >= 2),
       pg AS (
         SELECT doc_id, lang, gram, count(*) AS c
         FROM g GROUP BY 1, 2, 3),
       pd AS (
         SELECT doc_id, lang,
                1.0 - count(*) / CAST(sum(c) AS DOUBLE) AS dup_frac,
                max(c) / CAST(sum(c) AS DOUBLE) AS top_frac
         FROM pg GROUP BY 1, 2)
       SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
              round(avg(dup_frac), 6) AS avg_dup_frac,
              round(avg(top_frac), 6) AS avg_top_frac,
              CAST(sum(CASE WHEN dup_frac > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_flagged
       FROM pd GROUP BY lang ORDER BY lang"""

  // --------------------------------------------------------------- q113
  /** URL canonicalization + per-domain capping — the crawl-curation
    * staple: normalize scheme/host case, strip default port, www.
    * prefix, fragment and utm_* tracking params, then keep at most K
    * documents per registered domain in deterministic hash order (so
    * the cap is reproducible shard-by-shard, no global sort). The URL
    * is derived from (source, doc_id) so both engines canonicalize the
    * same strings. */
  private def q113(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val raw = concat(lit("HTTPS://WWW."), upper(col("source")),
      lit(".Example.COM:443/docs/"), pmod(col("doc_id"), lit(7)).cast("string"),
      lit("?utm_source=feed&id="), col("doc_id").cast("string"), lit("#sec"))
    // canonicalize: lowercase → drop #fragment → drop utm_* params
    // (mid-query then trailing, tidying a dangling ? or &) → drop :443
    // default port → drop www. — RE2-safe patterns (no lookaround) so
    // the DuckDB oracle runs the very same regexes.
    val c1 = lower(raw)
    val c2 = regexp_replace(c1, "#.*$", "")
    val c3 = regexp_replace(c2, "utm_[^&]*&", "")
    val c3b = regexp_replace(c3, "[?&]utm_[^&]*$", "")
    val c4 = regexp_replace(c3b, "[?&]$", "")
    val c5 = regexp_replace(c4, ":443/", "/")
    val canon = regexp_replace(c5, "^https://www\\.", "https://")
    val withUrl = d.select(col("doc_id"), canon.as("url"))
      .withColumn("host", regexp_extract(col("url"), "^https://([^/]+)/", 1))
    val w = Window.partitionBy(col("host"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    withUrl
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= 10)
      .select(col("host"), col("doc_id"), col("rk"), col("url"))
      .orderBy(col("host"), col("rk"))
  }

  private val q113Sql =
    """WITH u AS (
         SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       lower('HTTPS://WWW.' || upper(source) ||
                             '.Example.COM:443/docs/' || (doc_id % 7) ||
                             '?utm_source=feed&id=' || doc_id || '#sec'),
                       '#.*$', ''),
                     'utm_[^&]*&', '', 'g'),
                   '[?&]utm_[^&]*$', ''),
                 '[?&]$', ''),
               ':443/', '/'),
             '^https://www\.', 'https://') AS url
         FROM documents),
       h AS (
         SELECT doc_id, url,
                regexp_extract(url, '^https://([^/]+)/', 1) AS host
         FROM u),
       r AS (
         SELECT host, doc_id, url,
                row_number() OVER (
                  PARTITION BY host ORDER BY md5(doc_id::VARCHAR), doc_id)
                  AS rk
         FROM h)
       SELECT host, doc_id, CAST(rk AS INT) AS rk, url
       FROM r WHERE rk <= 10
       ORDER BY host, rk"""

  // --------------------------------------------------------------- q114
  /** Training-chunk splitting — fixed 64-token windows with stride 48
    * (overlapping context windows, the standard LM pretraining shard
    * shape). sequence() + explode generates chunk starts without a
    * self-join; per-chunk metadata (length, boundary tokens) instead of
    * materializing chunk text keeps the output narrow. */
  private def q114(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val (c, st) = (64, 48)
    d.select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), col("ws"),
        explode(expr(s"sequence(1, size(ws), $st)")).as("start"))
      .select(col("doc_id"),
        ((col("start") - 1) / st).cast("int").as("chunk_idx"),
        least(lit(c), size(col("ws")) - col("start") + 1).as("n_tok"),
        element_at(col("ws"), col("start")).as("head_tok"),
        element_at(col("ws"),
          col("start") + least(lit(c), size(col("ws")) - col("start") + 1) - 1)
          .as("tail_tok"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val q114Sql =
    """WITH w AS (
         SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
       ch AS (
         SELECT doc_id, i AS start,
                CAST((i - 1) / 48 AS INT) AS chunk_idx,
                least(64, len(ws) - i + 1) AS n_tok, ws
         FROM w, unnest(range(1, len(ws) + 1, 48)) AS t(i))
       SELECT doc_id, chunk_idx, CAST(n_tok AS INT) AS n_tok,
              ws[start] AS head_tok,
              ws[start + n_tok - 1] AS tail_tok
       FROM ch ORDER BY doc_id, chunk_idx"""

  // --------------------------------------------------------------- q115
  /** Embedding normalization + int8 quantization — the storage/serving
    * transform for ANN indexes: L2 norm, max-abs scale, per-element
    * round to signed 8-bit. Pure higher-order array functions (one
    * projection, no shuffle, codegen'd); the checksum columns keep the
    * oracle narrow while pinning every quantized element. */
  private def q115(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("embeddings")
    e.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .select(col("vec_id"),
        expr("round(sqrt(aggregate(v, 0.0D, (a, x) -> a + x * x)), 6)").as("l2_norm"),
        expr("array_max(transform(v, x -> abs(x)))").as("mx"),
        col("v"))
      .select(col("vec_id"), col("l2_norm"),
        expr("transform(v, x -> cast(round(x / mx * 127) as int))").as("q"))
      .select(col("vec_id"), col("l2_norm"),
        expr("aggregate(q, 0, (a, x) -> a + x)").as("q_sum"),
        expr("size(filter(q, x -> x != 0))").as("q_nnz"),
        expr("array_max(q)").as("q_max"))
      .orderBy(col("vec_id"))
  }

  private val q115Sql =
    """WITH v AS (
         SELECT vec_id,
                list_transform(embedding, x -> x::DOUBLE) AS v
         FROM embeddings),
       n AS (
         SELECT vec_id,
                round(sqrt(list_aggregate(
                  list_transform(v, x -> x * x), 'sum')), 6) AS l2_norm,
                list_max(list_transform(v, x -> abs(x))) AS mx, v
         FROM v),
       q AS (
         SELECT vec_id, l2_norm,
                list_transform(v, x -> round(x / mx * 127)::INT) AS q
         FROM n)
       SELECT vec_id, l2_norm,
              CAST(list_aggregate(q, 'sum') AS INT) AS q_sum,
              CAST(len(list_filter(q, x -> x != 0)) AS INT) AS q_nnz,
              CAST(list_max(q) AS INT) AS q_max
       FROM q ORDER BY vec_id"""

  override def queries: Map[String, QueryFn] = Map(
    "q112_gopher_repetition" -> q112,
    "q113_url_domains" -> q113,
    "q114_chunking" -> q114,
    "q115_vec_quantize" -> q115)

  override def oracles: Map[String, String] = Map(
    "q112_gopher_repetition" -> q112Sql,
    "q113_url_domains" -> q113Sql,
    "q114_chunking" -> q114Sql,
    "q115_vec_quantize" -> q115Sql)
}
