package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.{Dedup, Similarity}

/** Round-8 pack, part 4: operational tuning tables — the hot-bucket
  * cap sweep (q389) and the ANN recall audit (q390).
  */
object Extras61 extends QueryPack {

  // --------------------------------------------------------------- q389
  /** Cap-parameter sweep for the hot-bucket guard: for cap ∈ {5, 10,
    * 50}, how many buckets go hot, the rows and per-band pair volume
    * the cap removes, and the pair volume it keeps — the table that
    * answers "what cap should this corpus run with" from ONE pass
    * over the band-bucket sizes (the per-cap rollup explodes the tiny
    * bucket-size relation, never the corpus; q314's band sweep is the
    * recall side of this trade, this is the cost side). Pair volumes
    * are per-band (before cross-band candidate dedup), in exact Long
    * math. md5 family + raw keys so DuckDB replays it. */
  private def q389(s: SparkSession, dir: String): DataFrame = {
    val caps = Seq(5, 10, 50)
    val bk = Dedup.minhashBandRowsMd5(Tables(s, dir)("documents"), "doc_id", "text")
      .groupBy("band_idx", "band_key").agg(count(lit(1)).as("c"))
    bk.select(col("c"), explode(typedLit(caps)).as("cap"))
      .groupBy("cap")
      .agg(count(lit(1)).cast("long").as("n_buckets"),
        sum(when(col("c") > col("cap"), 1L).otherwise(0L)).as("n_hot"),
        sum(when(col("c") > col("cap"), col("c")).otherwise(0L))
          .as("rows_skipped"),
        sum(when(col("c") > col("cap"),
          shiftright(col("c") * (col("c") - 1), 1)).otherwise(0L))
          .as("pairs_avoided"),
        sum(when(col("c") <= col("cap"),
          shiftright(col("c") * (col("c") - 1), 1)).otherwise(0L))
          .as("pairs_kept"))
      .orderBy("cap")
  }

  private val q389Sql = {
    val P = graft.functions.expressions.MinHashSignature.P
    val sigList = (0 until 16)
      .map { i =>
        val (a, b) = graft.functions.expressions.MinHashSignature.coef(i)
        s"list_min(list_transform(hx, x -> ($a * x + $b) % $P))"
      }
      .mkString("[", ", ", "]")
    val bandKey = (1 to 4)
      .map(j => s"sig[4 * t.b + $j]::VARCHAR")
      .mkString(" || ',' || ")
    s"""WITH d AS (
         SELECT doc_id,
           list_transform(
             list_distinct(list_transform(generate_series(1, length(text) - 4),
               i -> substring(text, i, 5))),
             s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % $P) AS hx
         FROM documents WHERE length(text) >= 5),
       sigs AS (SELECT doc_id, $sigList AS sig FROM d),
       bands AS (
         SELECT doc_id, t.b AS band_idx, $bandKey AS band_key
         FROM sigs, unnest(generate_series(0, 3)) AS t(b)),
       bk AS MATERIALIZED (
         SELECT band_idx, band_key, count(*) AS c
         FROM bands GROUP BY band_idx, band_key),
       sw AS (SELECT c, u.cap FROM bk, unnest([5, 10, 50]) AS u(cap))
       SELECT cap,
              CAST(count(*) AS BIGINT) AS n_buckets,
              CAST(sum(CASE WHEN c > cap THEN 1 ELSE 0 END) AS BIGINT) AS n_hot,
              CAST(sum(CASE WHEN c > cap THEN c ELSE 0 END) AS BIGINT)
                AS rows_skipped,
              CAST(sum(CASE WHEN c > cap THEN c * (c - 1) // 2 ELSE 0 END)
                AS BIGINT) AS pairs_avoided,
              CAST(sum(CASE WHEN c <= cap THEN c * (c - 1) // 2 ELSE 0 END)
                AS BIGINT) AS pairs_kept
       FROM sw GROUP BY cap ORDER BY cap"""
  }

  // --------------------------------------------------------------- q390
  /** ANN recall audit, driver-checked: recall@10 of the SRP-LSH path
    * (q30's exact pipeline) against the brute-force ground truth
    * (q29's), per query vector and overall — the acceptance test an
    * ANN index must pass before replacing exact search. Both inputs
    * are themselves fully oracled paths; this composes them with one
    * equi-join on (query, neighbor). */
  private def q390(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir)("embeddings")
    val queries = emb.filter(col("vec_id") < 10)
    val k = 10
    val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k)
      .select(col("query_id"), col("neighbor_id"))
    val approx = Similarity.srpTopK(emb, queries, "vec_id", "embedding",
        k, dim = 64)
      .select(col("query_id"), col("neighbor_id").as("approx_id"))
    exact
      .join(approx,
        exact("query_id") === approx("query_id") &&
        exact("neighbor_id") === approx("approx_id"), "left")
      .groupBy(exact("query_id").as("query_id"))
      .agg(count(lit(1)).cast("long").as("k"),
        sum(when(col("approx_id").isNotNull, 1L).otherwise(0L))
          .as("n_hit"))
      .withColumn("recall", round(col("n_hit").cast("double") / col("k"), 6))
      .orderBy("query_id")
  }

  private val q390Sql = {
    import OracleVec.{dotSql, normSql}
    val bits = 16
    val bands = 4
    val r = bits / bands
    val mask = (1 << r) - 1
    import OracleVec.hpList
    val sigExpr = (0 until bits)
      .map(b => s"CASE WHEN ${dotSql("embedding", s"(${hpList(b)})")} > 0 THEN ${1 << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
       cos AS (
         SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
           CASE WHEN ${normSql("q.embedding")} * ${normSql("e.embedding")} = 0
                THEN 0.0
                ELSE ${dotSql("q.embedding", "e.embedding")} /
                  (${normSql("q.embedding")} * ${normSql("e.embedding")})
           END AS c
         FROM q JOIN embeddings e ON e.vec_id <> q.vec_id),
       exact AS (
         SELECT query_id, neighbor_id FROM (
           SELECT query_id, neighbor_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY c DESC, neighbor_id) AS rk
           FROM cos) WHERE rk <= 10),
       sigs AS MATERIALIZED (
         SELECT vec_id, CAST($sigExpr AS BIGINT) AS sig FROM embeddings),
       bnd AS MATERIALIZED (
         SELECT vec_id, t.b AS band_idx, (sig >> ($r * t.b)) & $mask AS band_key
         FROM sigs, unnest(generate_series(0, ${bands - 1})) AS t(b)),
       cand AS (
         SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id AS neighbor_id
         FROM bnd qb JOIN bnd cb
           ON qb.band_idx = cb.band_idx AND qb.band_key = cb.band_key
         WHERE qb.vec_id < 10 AND cb.vec_id <> qb.vec_id),
       approx AS (
         SELECT query_id, neighbor_id AS approx_id FROM (
           SELECT cand.query_id, cand.neighbor_id,
                  row_number() OVER (PARTITION BY cand.query_id
                                     ORDER BY cos.c DESC, cand.neighbor_id) AS rk
           FROM cand JOIN cos ON cos.query_id = cand.query_id
                             AND cos.neighbor_id = cand.neighbor_id)
         WHERE rk <= 10)
       SELECT exact.query_id,
              CAST(count(*) AS BIGINT) AS k,
              CAST(sum(CASE WHEN approx.approx_id IS NOT NULL
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
              round(sum(CASE WHEN approx.approx_id IS NOT NULL
                    THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS recall
       FROM exact LEFT JOIN approx
         ON approx.query_id = exact.query_id
        AND approx.approx_id = exact.neighbor_id
       GROUP BY exact.query_id ORDER BY exact.query_id"""
  }

  // --------------------------------------------------------------- q392
  /** Unicode NFC normalization ([[graft.functions.expressions.
    * UnicodeNormalize]]) — the pre-tokenization stage Spark lacks a
    * built-in for, oracled against DuckDB's utf8proc nfc_normalize().
    * The corpus is ASCII (already NFC), so the query APPENDS a
    * decomposed "é" (e + U+0301 combining acute) to every text inside
    * the plan: NFC must compose it (length shrinks by exactly one) and
    * leave the ASCII prefix byte-identical — both engines must agree
    * on the normalized STRING, not just lengths. */
  private def q392(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.expressions.UnicodeNormalize
    val decomposed = concat(col("text"), lit(" e\u0301"))
    Tables(s, dir)("documents")
      .select(col("doc_id"),
        length(decomposed).as("len_raw"),
        length(UnicodeNormalize.nfc(decomposed)).as("len_nfc"),
        substring(UnicodeNormalize.nfc(decomposed), -2, 2).as("tail_nfc"))
      .orderBy("doc_id")
  }

  private val q392Sql =
    """WITH d AS (
         SELECT doc_id, text || ' e' || chr(769) AS raw
         FROM documents)
       SELECT doc_id,
              CAST(length(raw) AS INT) AS len_raw,
              CAST(length(nfc_normalize(raw)) AS INT) AS len_nfc,
              substring(nfc_normalize(raw),
                        length(nfc_normalize(raw)) - 1, 2) AS tail_nfc
       FROM d ORDER BY doc_id"""

  // --------------------------------------------------------------- q393
  /** EPOCH planner — the over-sampling half of data mixing (q292 plans
    * the under-supply direction, capping rates at 1): with a token
    * budget of 2× the corpus split equally across sources, a source
    * whose equal share EXCEEDS its supply is repeated — full_epochs
    * whole passes plus a fractional pass at an exact-ratio rate
    * (deterministically realized downstream by the q76 md5-bucket
    * filter). The "repeat Wikipedia N times" table, in exact integer
    * arithmetic. */
  private def q393(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val perSrc = d.select(col("source"),
        size(filter(split(trim(col("text")), "\\s+"),
          w => length(w) > 0)).as("toks"))
      .groupBy("source").agg(sum("toks").as("tok"))
    val tot = perSrc.agg(sum("tok").as("tt"), count(lit(1)).as("ns"))
    perSrc.crossJoin(broadcast(tot))
      .withColumn("target", floor(lit(2) * col("tt") / col("ns")).cast("long"))
      .withColumn("full_epochs", floor(col("target") / col("tok")).cast("long"))
      .withColumn("frac_rate",
        round((col("target") - col("full_epochs") * col("tok"))
          .cast("double") / col("tok"), 6))
      .select(col("source"), col("tok").cast("long").as("n_tokens"),
        col("target"), col("full_epochs"), col("frac_rate"),
        (col("full_epochs") * col("tok") +
          floor(((col("target") - col("full_epochs") * col("tok"))
            .cast("double") / col("tok")) * col("tok")))
          .cast("long").as("expected_tokens"))
      .orderBy("source")
  }

  private val q393Sql =
    """WITH per AS (
         SELECT source,
                sum(len(list_filter(regexp_split_to_array(trim(text),
                  '\s+'), w -> w <> ''))) AS tok
         FROM documents GROUP BY 1),
       tot AS (SELECT sum(tok) AS tt, count(*) AS ns FROM per),
       plan AS (
         SELECT source, tok,
                CAST(floor(2.0 * tt / ns) AS BIGINT) AS target
         FROM per CROSS JOIN tot),
       ep AS (
         SELECT source, tok, target,
                CAST(floor(CAST(target AS DOUBLE) / tok) AS BIGINT)
                  AS full_epochs
         FROM plan)
       SELECT source, CAST(tok AS BIGINT) AS n_tokens, target, full_epochs,
              round(CAST(target - full_epochs * tok AS DOUBLE) / tok, 6)
                AS frac_rate,
              CAST(full_epochs * tok +
                floor(CAST(target - full_epochs * tok AS DOUBLE)
                      / tok * tok) AS BIGINT) AS expected_tokens
       FROM ep ORDER BY source"""

  override def queries: Map[String, QueryFn] = Map(
    "q389_cap_sweep" -> q389 _,
    "q390_ann_recall" -> q390 _,
    "q392_unicode_nfc" -> q392 _,
    "q393_epoch_plan" -> q393 _)

  override def oracles: Map[String, String] = Map(
    "q389_cap_sweep" -> q389Sql,
    "q390_ann_recall" -> q390Sql,
    "q392_unicode_nfc" -> q392Sql,
    "q393_epoch_plan" -> q393Sql)
}
