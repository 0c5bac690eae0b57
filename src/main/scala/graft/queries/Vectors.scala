package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.Similarity

/** Embedding-column coverage: per-label stats, brute-force cosine top-k,
  * SRP-LSH approximate top-k, blocked near-dup pairs.
  *
  * The DuckDB twins compute the same sequential double folds over the
  * float lists (list_transform to DOUBLE first), so cosine values agree
  * bit-for-bit after rounding. q30 (SRP) bakes its driver-computed
  * hyperplane literals straight into the oracle SQL, so even the LSH
  * bucketing is verified; SimilaritySpec additionally pins recall
  * against the exact q29 baseline.
  */
object Vectors extends QueryPack {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir)("embeddings")

  private val Dim = 64

  // DuckDB twins of VectorFunctions.dot/norm on the embedding column.
  import OracleVec.{dotSql, normSql}

  // ---------------------------------------------------------------- q28
  /** Per-label embedding stats: count + norm distribution. One pass;
    * the norm is a 64-element fold inside codegen. */
  private def q28(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(col("label"), VectorFunctions.norm(col("embedding")).as("nrm"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
           round(avg(col("nrm")), 6).as("avg_norm"),
           round(min(col("nrm")), 6).as("min_norm"),
           round(max(col("nrm")), 6).as("max_norm"))
      .orderBy(col("label"))

  private val q28Sql =
    s"""SELECT label, count(*) AS n_vecs,
       round(avg(nrm), 6) AS avg_norm,
       round(min(nrm), 6) AS min_norm,
       round(max(nrm), 6) AS max_norm
       FROM (SELECT label, ${normSql("embedding")} AS nrm FROM embeddings)
       GROUP BY label ORDER BY label"""

  // ---------------------------------------------------------------- q29
  /** Exact ANN baseline: brute-force cosine top-5 for every 50th vector
    * as query, query side broadcast. */
  private def q29(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val queries = all.filter(pmod(col("vec_id"), lit(50)) === 0)
    Similarity.bruteForceTopK(all, queries, "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
              round(col("cos"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val q29Sql =
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id % 50 = 0),
       c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
       scored AS (
         SELECT query_id, neighbor_id,
           ${dotSql("qv", "cv")} / (${normSql("qv")} * ${normSql("cv")}) AS cos
         FROM c JOIN q ON query_id <> neighbor_id),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         FROM scored)
       SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 6) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""

  // ---------------------------------------------------------------- q30
  /** Approximate ANN — SRP-LSH bucketed candidates, exact re-rank.
    * The hyperplanes are driver-computed double literals, so the oracle
    * bakes the SAME doubles into the SQL: signature bits, band buckets,
    * candidate set, and re-rank all reproduce exactly. Recall vs q29
    * additionally pinned in SimilaritySpec. */
  private def q30(s: SparkSession, dir: String): DataFrame = {
    val all = emb(s, dir)
    val queries = all.filter(pmod(col("vec_id"), lit(50)) === 0)
    Similarity.srpTopK(all, queries, "vec_id", "embedding", k = 5, dim = Dim)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
              round(col("cos"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val q30Sql = {
    val bits = 16
    val bands = 4
    val r = bits / bands
    val mask = (1 << r) - 1
    // the exact hyperplane doubles the Spark plan inlines as literals;
    // an exponent suffix forces DuckDB to parse them as DOUBLE directly
    // (bare decimals parse as DECIMAL, whose double conversion is not
    // guaranteed correctly rounded at 17 significant digits)
    def hpList(b: Int): String =
      Similarity.hyperplane(b, Dim)
        .map { d =>
          val s = d.toString
          if (s.contains("E") || s.contains("e")) s else s + "e0"
        }
        .mkString("[", ", ", "]")
    val sigExpr = (0 until bits)
      .map(b => s"CASE WHEN ${dotSql("embedding", s"(${hpList(b)})")} > 0 THEN ${1 << b} ELSE 0 END")
      .mkString(" + ")
    s"""WITH sigs AS (
         SELECT vec_id, CAST($sigExpr AS BIGINT) AS sig FROM embeddings),
       bands AS (
         SELECT vec_id, t.b AS band_idx, (sig >> ($r * t.b)) & $mask AS band_key
         FROM sigs, unnest(generate_series(0, ${bands - 1})) AS t(b)),
       cand AS (
         SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
         FROM bands q JOIN bands c
           ON q.band_idx = c.band_idx AND q.band_key = c.band_key
         WHERE q.vec_id % 50 = 0 AND q.vec_id <> c.vec_id),
       scored AS (
         SELECT query_id, neighbor_id,
           ${dotSql("eq.embedding", "ec.embedding")} /
             (${normSql("eq.embedding")} * ${normSql("ec.embedding")}) AS cos
         FROM cand
         JOIN embeddings eq ON eq.vec_id = query_id
         JOIN embeddings ec ON ec.vec_id = neighbor_id),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
         FROM scored)
       SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank, round(cos, 6) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""
  }

  // ---------------------------------------------------------------- q31
  /** Embedding near-dup pairs, blocked by label (the blocking key is the
    * scale story: no all-pairs join) at cosine >= 0.3. */
  private def q31(s: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(emb(s, dir), "vec_id", "embedding",
                            blockCol = "label", threshold = 0.3)
      .select(col("blk").as("label"), col("id_a"), col("id_b"),
              round(col("cos"), 6).as("cos"))
      .orderBy(col("label"), col("id_a"), col("id_b"))

  private val q31Sql =
    s"""WITH e AS (SELECT vec_id, label, embedding FROM embeddings),
       p AS (
         SELECT a.label AS label, a.vec_id AS id_a, b.vec_id AS id_b,
           ${dotSql("a.embedding", "b.embedding")} /
             (${normSql("a.embedding")} * ${normSql("b.embedding")}) AS cos
         FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
       SELECT label, id_a, id_b, round(cos, 6) AS cos
       FROM p WHERE cos >= 0.3 ORDER BY label, id_a, id_b"""

  override val queries: Map[String, QueryFn] = Map(
    "q28_embedding_stats" -> q28 _,
    "q29_cosine_topk"     -> q29 _,
    "q30_srp_ann"         -> q30 _,
    "q31_embedding_dedup" -> q31 _)

  override val oracles: Map[String, String] = Map(
    "q28_embedding_stats" -> q28Sql,
    "q29_cosine_topk"     -> q29Sql,
    "q30_srp_ann"         -> q30Sql,
    "q31_embedding_dedup" -> q31Sql)
}
