package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Similarity

/** Embedding coverage, part 2 (round 2): IVF approximate
  * nearest-neighbor — the bucketed scale path the brief calls for
  * alongside brute force (q29) and SRP-LSH (q30). Unlike SRP, the whole
  * IVF pipeline (centroid assignment → probe → re-rank) is plain
  * relational algebra, so DuckDB can replay it exactly and the query is
  * fully hash-checked, not just rows-only.
  */
object Vectors2 extends QueryPack {

  private val Dim = 64

  import OracleVec.{dotSql, normSql}

  /** Cosine with the SAME zero-norm guard as the Scala side
    * (Similarity guards `norm_a * norm_b == 0` to 0.0): an unguarded
    * division would yield NULL/NaN on a zero-norm embedding and silently
    * hash-mismatch if testdata is ever regenerated with one. */
  private def cosSql(a: String, b: String) =
    s"""CASE WHEN ${normSql(a)} * ${normSql(b)} = 0 THEN 0.0
        ELSE ${dotSql(a, b)} / (${normSql(a)} * ${normSql(b)}) END"""

  // ---------------------------------------------------------------- q60
  /** IVF ANN: 16 deterministic centroids (vec_id < 16 stand in for a
    * k-means fit), every vector assigned to its nearest centroid, each
    * query probing its 2 nearest buckets, exact cosine re-rank top-5.
    * Same query set and output shape as q29, so recall is measurable
    * (SimilaritySpec). */
  private def q60(s: SparkSession, dir: String): DataFrame = {
    val all = Tables(s, dir)("embeddings")
    val queries = all.filter(pmod(col("vec_id"), lit(50)) === 0)
    val centroids = all.filter(col("vec_id") < 16)
    Similarity.ivfTopK(all, queries, "vec_id", "embedding", k = 5,
        centroids = centroids, centroidIdCol = "vec_id", nprobe = 2)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
              round(col("cos"), 6).as("cos"))
      .orderBy(col("query_id"), col("rank"))
  }

  private val q60Sql =
    s"""WITH cent AS (
         SELECT vec_id AS centroid_id, embedding AS centv
         FROM embeddings WHERE vec_id < 16),
       acand AS (
         SELECT e.vec_id, e.embedding, c.centroid_id,
           ${cosSql("e.embedding", "c.centv")} AS ccos
         FROM embeddings e CROSS JOIN cent c),
       arank AS (
         SELECT vec_id, embedding, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY ccos DESC, centroid_id) AS crk
         FROM acand),
       assigned AS (
         SELECT centroid_id AS bucket, vec_id AS neighbor_id, embedding AS cv
         FROM arank WHERE crk = 1),
       probes AS (
         SELECT centroid_id AS bucket, vec_id AS query_id, embedding AS qv
         FROM arank WHERE crk <= 2 AND vec_id % 50 = 0),
       cand AS (
         SELECT p.query_id, a.neighbor_id,
           ${cosSql("p.qv", "a.cv")} AS cos
         FROM probes p JOIN assigned a USING (bucket)
         WHERE p.query_id <> a.neighbor_id),
       ranked AS (
         SELECT query_id, neighbor_id, cos,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos DESC, neighbor_id) AS rank
         FROM cand)
       SELECT query_id, neighbor_id, CAST(rank AS INT) AS rank,
         round(cos, 6) AS cos
       FROM ranked WHERE rank <= 5 ORDER BY query_id, rank"""

  // --------------------------------------------------------------- q345
  /** SemDeDup-style semantic dedup: the q60 coarse quantizer (16
    * deterministic centroids) becomes a LEARNED blocking key — every
    * vector assigned to its nearest centroid bucket, then exact cosine
    * >= 0.3 only within buckets. Complements q31 (label blocking):
    * same near-dup operator family, no label needed. Fully relational,
    * so DuckDB replays it exactly. */
  private def q345(s: SparkSession, dir: String): DataFrame = {
    val all = Tables(s, dir)("embeddings")
    Similarity.semanticDedup(all, "vec_id", "embedding",
        centroids = all.filter(col("vec_id") < 16),
        centroidIdCol = "vec_id", threshold = 0.3)
      .select(col("bucket"), col("id_a"), col("id_b"),
              round(col("cos"), 6).as("cos"))
      .orderBy(col("bucket"), col("id_a"), col("id_b"))
  }

  private val q345Sql =
    s"""WITH cent AS (
         SELECT vec_id AS centroid_id, embedding AS centv
         FROM embeddings WHERE vec_id < 16),
       acand AS (
         SELECT e.vec_id, e.embedding, c.centroid_id,
           ${cosSql("e.embedding", "c.centv")} AS ccos
         FROM embeddings e CROSS JOIN cent c),
       arank AS (
         SELECT vec_id, embedding, centroid_id,
           ROW_NUMBER() OVER (PARTITION BY vec_id
             ORDER BY ccos DESC, centroid_id) AS crk
         FROM acand),
       assigned AS (
         SELECT centroid_id AS bucket, vec_id, embedding
         FROM arank WHERE crk = 1),
       p AS (
         SELECT a.bucket, a.vec_id AS id_a, b.vec_id AS id_b,
           ${cosSql("a.embedding", "b.embedding")} AS cos
         FROM assigned a JOIN assigned b
           ON a.bucket = b.bucket AND a.vec_id < b.vec_id)
       SELECT bucket, id_a, id_b, round(cos, 6) AS cos
       FROM p WHERE cos >= 0.3 ORDER BY bucket, id_a, id_b"""

  // --------------------------------------------------------------- q346
  /** The FULL semantic-dedup production composition: KMeans.fit trains
    * the coarse quantizer (k=8, 3 Lloyd iterations, deterministic md5
    * init) and its centroids drive semanticDedup's bucket blocking —
    * q345's shape with a LEARNED quantizer instead of the vec_id<16
    * stand-in, closing the KMeans→semanticDedup composition end-to-end
    * under a driver-green row (KMeansSpec pins the fit itself; q345
    * pins the dedup with fixed centroids).
    *
    * Fitted centroids are ROUNDED to 6 dp before use: Lloyd's mean
    * aggregation sums doubles in shuffle-arrival order, so the raw fit
    * is only last-ulp-stable — rounding makes every downstream dot
    * product bit-deterministic across session configs, which is what
    * lets a committed golden snapshot serve as the DuckDB oracle
    * (DuckDB can't replay the FP-order-sensitive fit itself).
    *
    * Residual risk, accepted and fenced: INSIDE the fit, each Lloyd
    * iteration's argmin reads the unrounded partition-order-sensitive
    * sums, so a vector whose distance gap to two centroids is at
    * summation-jitter scale could in principle flip buckets under a
    * different partition count and move a centroid by more than 1e-6.
    * Measured stable across local(4)/local(8)/local(32) at all three
    * SFs (GoldenScaleSpec runs every `sbt test` at a different config
    * than generated the goldens); if testdata regeneration ever lands
    * on such a knife-edge, the spec goes red locally and the fix is a
    * one-command regen (tools.RegenGoldens), not a silent driver
    * mismatch. */
  private def q346(s: SparkSession, dir: String): DataFrame = {
    val all = Tables(s, dir)("embeddings")
    val (cent, _) = graft.operators.KMeans.fit(all, "vec_id", "embedding",
        k = 8, iters = 3)
    val rounded = cent.select(col("centroid_id"),
        transform(col("centroid"), x => round(x, 6)).as("embedding"))
    Similarity.semanticDedup(all, "vec_id", "embedding",
        centroids = rounded, centroidIdCol = "centroid_id", threshold = 0.3)
      .select(col("bucket"), col("id_a"), col("id_b"),
              round(col("cos"), 6).as("cos"))
      .orderBy(col("bucket"), col("id_a"), col("id_b"))
  }

  private val q346Sql = GoldenOracle.sql("q346_kmeans_semdedup",
    "bucket, id_a, id_b, cos", "bucket, id_a, id_b")

  // --------------------------------------------------------------- q358
  /** IVF-PQ top-k — the FULL 100 TB ANN composition (coarse k-means
    * buckets + residual product-quantization codes + nprobe-pruned ADC
    * scan; see [[graft.operators.IvfPq]]). The fitted state (coarse
    * centroids, codebooks) is rounded to 6 dp inside fit() under the
    * same cross-config determinism discipline (and residual risk fence)
    * as q346's golden scheme; all ranking ties break on neighbor id, so
    * the committed golden parquet is reproducible bit-for-bit. */
  private def q358(s: SparkSession, dir: String): DataFrame = {
    val all = Tables(s, dir)("embeddings")
    val model = graft.operators.IvfPq.fit(all, "vec_id", "embedding",
      dim = 64, coarseK = 8, m = 8, codes = 16, iters = 3)
    val enc = graft.operators.IvfPq.encode(all, "vec_id", "embedding", model)
    graft.operators.IvfPq.topK(enc,
        all.filter(col("vec_id") < 10), "vec_id", "embedding",
        model, k = 5, nprobe = 4)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
              round(col("adist"), 6).as("adist"))
      .orderBy("query_id", "rank")
  }

  private val q358Sql = GoldenOracle.sql("q358_ivfpq_ann",
    "query_id, rank, neighbor_id, adist", "query_id, rank")

  override val queries: Map[String, QueryFn] = Map(
    "q60_ivf_ann" -> q60 _,
    "q345_semantic_dedup" -> q345 _,
    "q346_kmeans_semdedup" -> q346 _,
    "q358_ivfpq_ann" -> q358 _)

  override val oracles: Map[String, String] = Map(
    "q60_ivf_ann" -> q60Sql,
    "q345_semantic_dedup" -> q345Sql,
    "q346_kmeans_semdedup" -> q346Sql,
    "q358_ivfpq_ann" -> q358Sql)
}
