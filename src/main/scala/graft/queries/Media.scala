package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal coverage: binary media columns decoded via the stubbed
  * partition-local decoder (graft.multimodal). The stub's features are
  * pure functions of the payload bytes, so even the mapPartitions path
  * is DuckDB-oracle-checkable: the oracle mirrors the feature formulas
  * over octet_length(encode(text)).
  */
object Media extends QueryPack {

  private def media(s: SparkSession, dir: String): DataFrame =
    Multimodal.mediaFromDocuments(Tables(s, dir)("documents"))

  // kind twin: element_at(['image','audio','video'], doc_id%3 + 1)
  private val kindSql =
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

  // ---------------------------------------------------------------- q36
  /** Decode + feature-extract over binary columns, aggregated per kind.
    * The decode is narrow (pipelines with the scan, no shuffle until the
    * 3-group aggregate). */
  private def q36(s: SparkSession, dir: String): DataFrame =
    Multimodal.extractFeatures(media(s, dir))
      .groupBy(col("kind"))
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("n_bytes")).as("sum_bytes"),
        round(avg(col("width")), 6).as("avg_width"),
        round(avg(col("height")), 6).as("avg_height"),
        sum(col("n_frames")).as("sum_frames"))
      .orderBy(col("kind"))

  private val q36Sql =
    s"""WITH m AS (
         SELECT doc_id AS media_id, $kindSql AS kind,
                octet_length(encode(text)) AS len
         FROM documents)
       SELECT kind, count(*) AS n_media,
         CAST(sum(len) AS BIGINT) AS sum_bytes,
         round(avg(64 + len % 512), 6) AS avg_width,
         round(avg(64 + (len * 7) % 512), 6) AS avg_height,
         CAST(sum(CASE WHEN kind = 'video' THEN 1 + len % 24 ELSE 1 END) AS BIGINT) AS sum_frames
       FROM m GROUP BY kind ORDER BY kind"""

  // ---------------------------------------------------------------- q37
  /** Frame sampling: one row per sampled frame of each video — the
    * explode shape of a real frame extractor, stride 6. */
  private def q37(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(Multimodal.extractFeatures(media(s, dir)), stride = 6)
      .orderBy(col("media_id"), col("frame_idx"))

  private val q37Sql =
    s"""WITH m AS (
         SELECT doc_id AS media_id, $kindSql AS kind,
                octet_length(encode(text)) AS len
         FROM documents),
       v AS (SELECT media_id, CAST(1 + len % 24 AS INT) AS n_frames
             FROM m WHERE kind = 'video')
       SELECT media_id, CAST(unnest(generate_series(0, n_frames - 1, 6)) AS INT) AS frame_idx,
              n_frames
       FROM v ORDER BY media_id, frame_idx"""

  override val queries: Map[String, QueryFn] = Map(
    "q36_media_features" -> q36 _,
    "q37_frame_sample"   -> q37 _)

  override val oracles: Map[String, String] = Map(
    "q36_media_features" -> q36Sql,
    "q37_frame_sample"   -> q37Sql)
}
