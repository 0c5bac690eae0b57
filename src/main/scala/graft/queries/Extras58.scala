package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Dedup

/** Round-8 pack, part 1: the hot-band cap — the guard on the one
  * data-dependent quadratic in banded LSH (a boilerplate band bucket
  * holding B docs emits B·(B−1)/2 candidate pairs; AQE splits
  * partitions, not pair counts). Both the skipped-mass accounting
  * (q379) and the capped candidate set itself (q380) are oracled on
  * the md5/raw-band-key family so DuckDB reproduces them exactly; the
  * xxhash64 production path takes the identical code route
  * (Dedup.dropHotBuckets) and is stress-pinned by DedupSpec's planted
  * 10k-doc boilerplate corpus.
  */
object Extras58 extends QueryPack {

  private val Cap = 10 // low enough to trigger on real buckets at every sf

  // --------------------------------------------------------------- q379
  /** Skipped-mass report of the hot-band cap over the full documents
    * table: per band, how many buckets exist, how many exceed the cap,
    * the rows they hold, and the pair count the cap avoided — the
    * accounting a curation funnel alerts on instead of silently
    * degrading recall. One aggregate over the band rows (same shuffle
    * keys the candidate join uses). */
  private def q379(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashCapReportMd5(Tables(s, dir)("documents"),
        "doc_id", "text", maxBucket = Cap)
      .orderBy("band_idx")

  private val q379Sql = {
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
       bk AS (SELECT band_idx, band_key, count(*) AS c
              FROM bands GROUP BY band_idx, band_key)
       SELECT CAST(band_idx AS INT) AS band_idx,
              CAST(count(*) AS BIGINT) AS n_buckets,
              CAST(sum(CASE WHEN c > $Cap THEN 1 ELSE 0 END) AS BIGINT)
                AS n_hot_buckets,
              CAST(sum(CASE WHEN c > $Cap THEN c ELSE 0 END) AS BIGINT)
                AS rows_skipped,
              CAST(sum(CASE WHEN c > $Cap THEN c * (c - 1) // 2 ELSE 0 END)
                AS BIGINT) AS pairs_avoided
       FROM bk GROUP BY band_idx ORDER BY band_idx"""
  }

  // --------------------------------------------------------------- q380
  /** The capped candidate set itself: the q26 pipeline (shingle →
    * md5-family signature → raw-key bands → est-Jaccard filter) over
    * the FULL documents table with buckets past the cap skipped before
    * the self-join. Together with q379 this pins both halves of the
    * cap's contract — what was dropped, and that the surviving pairs
    * are exactly the cold-bucket ones. */
  private def q380(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashDedupMd5(Tables(s, dir)("documents"),
        "doc_id", "text", maxBucket = Cap)
      .withColumn("est_jaccard", round(col("est_jaccard"), 6))
      .orderBy(col("id_a"), col("id_b"))

  private val q380Sql = {
    val P = graft.functions.expressions.MinHashSignature.P
    val sigList = (0 until 16)
      .map { i =>
        val (a, b) = graft.functions.expressions.MinHashSignature.coef(i)
        s"list_min(list_transform(hx, x -> ($a * x + $b) % $P))"
      }
      .mkString("[", ", ", "]")
    val agree = (1 to 16)
      .map(i => s"CASE WHEN sig_a[$i] = sig_b[$i] THEN 1 ELSE 0 END")
      .mkString(" + ")
    val bandKey = (1 to 4)
      .map(j => s"sig[4 * t.b + $j]::VARCHAR")
      .mkString(" || ',' || ")
    // `bands` feeds both the hot-bucket rollup and the pair join —
    // MATERIALIZED or DuckDB inlines it into each consumer
    s"""WITH d AS (
         SELECT doc_id,
           list_transform(
             list_distinct(list_transform(generate_series(1, length(text) - 4),
               i -> substring(text, i, 5))),
             s -> (('0x' || substr(md5(s), 1, 8))::BIGINT) % $P) AS hx
         FROM documents WHERE length(text) >= 5),
       sigs AS (SELECT doc_id, $sigList AS sig FROM d),
       bands AS MATERIALIZED (
         SELECT doc_id, sig, t.b AS band_idx, $bandKey AS band_key
         FROM sigs, unnest(generate_series(0, 3)) AS t(b)),
       hot AS (
         SELECT band_idx, band_key FROM bands
         GROUP BY band_idx, band_key HAVING count(*) > $Cap),
       cold AS (
         SELECT bands.* FROM bands
         WHERE NOT EXISTS (
           SELECT 1 FROM hot
           WHERE hot.band_idx = bands.band_idx
             AND hot.band_key = bands.band_key)),
       pairs AS (
         SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           a.sig AS sig_a, b.sig AS sig_b
         FROM cold a JOIN cold b
           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
              AND a.doc_id < b.doc_id),
       est AS (
         SELECT id_a, id_b, ($agree) / 16.0 AS e
         FROM pairs)
       SELECT id_a, id_b, round(e, 6) AS est_jaccard
       FROM est WHERE e >= 0.2 ORDER BY id_a, id_b"""
  }

  // --------------------------------------------------------------- q382
  private val Dim = 64
  import OracleVec.{dotSql, normSql}

  /** Embedding-space decontamination — the paraphrase-leakage
    * companion of q75's n-gram path: eval rows (vec_id % 97 = 0, the
    * q75 eval-suite convention) broadcast as a banded SRP index; every
    * corpus row sharing a band with an eval row is verified with exact
    * cosine and flagged at ≥ 0.4. The oracle replays the identical
    * blocking (hyperplane literals, as q371), so the flag set is
    * engine-identical. */
  private def q382(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.Similarity
    val all = Tables(s, dir)("embeddings")
    Similarity.decontaminateByEmbedding(
        all.filter(pmod(col("vec_id"), lit(97)) =!= 0),
        all.filter(pmod(col("vec_id"), lit(97)) === 0),
        "vec_id", "embedding", threshold = 0.4, dim = Dim)
      .select(col("id").as("vec_id"), col("n_eval_hits"),
        round(col("max_cos"), 6).as("max_cos"))
      .orderBy("vec_id")
  }

  private val q382Sql: String = {
    val bits = 16
    val bands = 4
    val r = bits / bands
    val mask = (1 << r) - 1
    import OracleVec.hpList
    val sigExpr = (0 until bits)
      .map(b => s"CASE WHEN ${dotSql("embedding", s"(${hpList(b)})")} > 0 THEN ${1 << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH sigs AS MATERIALIZED (
         SELECT vec_id, CAST($sigExpr AS BIGINT) AS sig FROM embeddings),
       bnd AS MATERIALIZED (
         SELECT vec_id, t.b AS band_idx, (sig >> ($r * t.b)) & $mask AS band_key
         FROM sigs, unnest(generate_series(0, ${bands - 1})) AS t(b)),
       cand AS (
         SELECT DISTINCT c.vec_id AS vec_id, e.vec_id AS eval_id
         FROM bnd c JOIN bnd e
           ON c.band_idx = e.band_idx AND c.band_key = e.band_key
         WHERE c.vec_id % 97 <> 0 AND e.vec_id % 97 = 0),
       scored AS (
         SELECT cand.vec_id, cand.eval_id,
           CASE WHEN ${normSql("ec.embedding")} * ${normSql("ee.embedding")} = 0
                THEN 0.0
                ELSE ${dotSql("ec.embedding", "ee.embedding")} /
                  (${normSql("ec.embedding")} * ${normSql("ee.embedding")})
           END AS cos
         FROM cand
         JOIN embeddings ec ON ec.vec_id = cand.vec_id
         JOIN embeddings ee ON ee.vec_id = cand.eval_id)
       SELECT vec_id,
              count(DISTINCT eval_id) AS n_eval_hits,
              round(max(cos), 6) AS max_cos
       FROM scored WHERE cos >= 0.4
       GROUP BY vec_id ORDER BY vec_id"""
  }

  override def queries: Map[String, QueryFn] = Map(
    "q379_lsh_bucket_cap" -> q379 _,
    "q380_minhash_capped" -> q380 _,
    "q382_embed_decontam" -> q382 _)

  override def oracles: Map[String, String] = Map(
    "q379_lsh_bucket_cap" -> q379Sql,
    "q380_minhash_capped" -> q380Sql,
    "q382_embed_decontam" -> q382Sql)
}
