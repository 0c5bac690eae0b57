package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{ConnectedComponents, Similarity}

/** Corpus-curation coverage (round 2): the composed end-to-end shapes a
  * training-data pipeline actually runs — multi-stage curation
  * (dedup → quality filter → per-slice stats) and near-dup CLUSTERING
  * (pairs → connected components → canonical representative).
  */
object Curation extends QueryPack {

  // ---------------------------------------------------------------- q64
  /** Corpus curation pipeline, composed from already-verified stages:
    * exact dedup by content fingerprint (min doc_id survives), length
    * window quality filter, then per-(lang, source) corpus stats. One
    * fingerprint shuffle + one broadcast-able survivor join + one final
    * aggregate — the whole curation pass is three stages at any scale. */
  private def q64(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val survivors = d
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
      .groupBy(col("fp")).agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    d.join(survivors, Seq("doc_id"))
      .filter(col("n_chars") >= 100 && col("n_chars") <= 500)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
           round(avg(col("n_chars")), 4).as("avg_chars"),
           min(col("n_chars")).as("min_chars"),
           max(col("n_chars")).as("max_chars"))
      .orderBy(col("lang"), col("source"))
  }

  private val q64Sql =
    """WITH fp AS (
         SELECT doc_id,
           md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
         FROM documents),
       surv AS (SELECT min(doc_id) AS doc_id FROM fp GROUP BY fp),
       kept AS (
         SELECT d.* FROM documents d JOIN surv USING (doc_id)
         WHERE n_chars >= 100 AND n_chars <= 500)
       SELECT lang, source, count(*) AS n_docs,
         round(avg(n_chars), 4) AS avg_chars,
         min(n_chars) AS min_chars, max(n_chars) AS max_chars
       FROM kept GROUP BY lang, source ORDER BY lang, source"""

  // ---------------------------------------------------------------- q65
  /** Near-dup clustering: q31's embedding near-dup pairs promoted to
    * components via distributed spanning-forest contraction — transitive
    * links collapse into one cluster with the min vec_id as canonical
    * representative. The oracle replays the same clustering as a
    * recursive transitive-closure CTE. */
  private def q65(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables(s, dir)("embeddings")
    val pairs = Similarity.nearDupPairs(emb, "vec_id", "embedding",
                                        blockCol = "label", threshold = 0.3)
      .select(col("id_a"), col("id_b"))
    ConnectedComponents.components(pairs, "id_a", "id_b")
      .select(col("id").as("vec_id"), col("component").as("cluster"))
      .orderBy(col("vec_id"))
  }

  private val q65Sql = {
    import OracleVec.{dotSql => dot, normSql => nrm}
    s"""WITH RECURSIVE
       p AS (
         SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ${dot("a.embedding", "b.embedding")} /
             (${nrm("a.embedding")} * ${nrm("b.embedding")}) AS cos
         FROM embeddings a JOIN embeddings b
           ON a.label = b.label AND a.vec_id < b.vec_id),
       edges AS (SELECT id_a, id_b FROM p WHERE cos >= 0.3),
       und AS (SELECT id_a AS a, id_b AS b FROM edges
               UNION SELECT id_b, id_a FROM edges),
       cc AS (
         SELECT a, b FROM und
         UNION
         SELECT cc.a, u.b FROM cc JOIN und u ON cc.b = u.a)
       SELECT a AS vec_id, least(a, min(b)) AS cluster
       FROM cc GROUP BY a ORDER BY vec_id"""
  }

  override val queries: Map[String, QueryFn] = Map(
    "q64_corpus_pipeline" -> q64 _,
    "q65_dup_clusters"    -> q65 _)

  override val oracles: Map[String, String] = Map(
    "q64_corpus_pipeline" -> q64Sql,
    "q65_dup_clusters"    -> q65Sql)
}
