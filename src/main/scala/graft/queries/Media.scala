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

  // --------------------------------------------------------------- q373
  /** Windowed audio-energy segmentation per media: the payload decodes
    * as unsigned 8-bit PCM in 32-byte windows (partition-local, exact
    * integer Σ(sample−128)² per window), rolled up per audio file into
    * window count, total/peak energy and the count of "active" windows
    * above a fixed threshold — the VAD/loudness profile shape. The
    * documents payload is pure ASCII at every sf (byte length == char
    * length, asserted by the oracle's construction), so the DuckDB twin
    * replays each byte as ascii(substr(text, j, 1)). */
  private def q373(s: SparkSession, dir: String): DataFrame =
    Multimodal.audioEnergy(media(s, dir), window = 32)
      .groupBy("media_id")
      .agg(
        count(lit(1)).cast("long").as("n_windows"),
        sum(col("sum_sq")).cast("long").as("total_sq"),
        max(col("sum_sq")).cast("long").as("peak_sq"),
        sum(when(col("sum_sq") > 50000, 1L).otherwise(0L)).cast("long")
          .as("active_windows"))
      .orderBy("media_id")

  private val q373Sql =
    """WITH m AS (
         SELECT doc_id AS media_id, text, length(text) AS len
         FROM documents WHERE doc_id % 3 = 1),
       w AS (
         SELECT media_id, text, len, CAST(u.i AS INT) AS window_idx
         FROM m, unnest(generate_series(0, (len - 1) // 32)) AS u(i)),
       e AS (
         SELECT media_id, window_idx,
                CAST(list_sum(list_transform(
                  generate_series(window_idx * 32 + 1,
                                  least(window_idx * 32 + 32, len)),
                  j -> (ascii(substr(text, j, 1)) - 128)
                       * (ascii(substr(text, j, 1)) - 128))) AS BIGINT)
                  AS sum_sq
         FROM w)
       SELECT media_id,
              CAST(count(*) AS BIGINT) AS n_windows,
              CAST(sum(sum_sq) AS BIGINT) AS total_sq,
              CAST(max(sum_sq) AS BIGINT) AS peak_sq,
              CAST(sum(CASE WHEN sum_sq > 50000 THEN 1 ELSE 0 END) AS BIGINT)
                AS active_windows
       FROM e GROUP BY media_id ORDER BY media_id"""

  // --------------------------------------------------------------- q374
  /** Image near-dup screen via perceptual aHash: per-image 64-bit
    * block-mean fingerprint (exact integer bit decisions — see
    * [[Multimodal.imageHash]]) carried as four 16-bit chunks that
    * double as SimHash-style LSH band keys. Candidates = images sharing
    * any chunk (banded equi-join, never all-pairs); every candidate is
    * scored with its exact Hamming distance and flagged at the ≤6
    * near-dup radius — the full candidate table is emitted so the
    * blocking selectivity itself is driver-checked at every sf. */
  private def q374(s: SparkSession, dir: String): DataFrame =
    // uncapped here so the oracle reproduces the full candidate table;
    // the hot-bucket cap path is stress-pinned by MultimodalSpec
    Multimodal.imageNearDup(media(s, dir), maxHamming = 6)
      .orderBy("id_a", "id_b")

  private val q374Sql =
    """WITH m AS (
         SELECT doc_id AS media_id, text, length(text) AS len
         FROM documents WHERE doc_id % 3 = 0),
       blocks AS (
         SELECT media_id, CAST(b AS INT) AS b,
                ((b * len) // 64) AS lo, (((b + 1) * len) // 64) AS hi,
                len,
                CAST(coalesce(list_sum(list_transform(
                  generate_series((b * len) // 64 + 1,
                                  ((b + 1) * len) // 64),
                  j -> ascii(substr(text, j, 1)))), 0) AS BIGINT) AS bsum
         FROM m, unnest(generate_series(0, 63)) AS u(b)),
       tot AS (SELECT media_id, sum(bsum) AS tsum, max(len) AS len
               FROM blocks GROUP BY media_id),
       bits AS (
         SELECT blocks.media_id, b,
                CASE WHEN bsum * tot.len > tot.tsum * (hi - lo)
                     THEN 1 ELSE 0 END AS bit
         FROM blocks JOIN tot ON blocks.media_id = tot.media_id),
       chunks AS (
         SELECT media_id, CAST(b // 16 AS INT) AS ci,
                CAST(sum(bit * (1 << (b % 16))) AS INT) AS cv
         FROM bits GROUP BY media_id, b // 16),
       cand AS (
         SELECT DISTINCT a.media_id AS id_a, b.media_id AS id_b
         FROM chunks a JOIN chunks b
           ON a.ci = b.ci AND a.cv = b.cv AND a.media_id < b.media_id),
       fp AS (
         SELECT media_id,
                max(CASE WHEN ci = 0 THEN cv END) AS c0,
                max(CASE WHEN ci = 1 THEN cv END) AS c1,
                max(CASE WHEN ci = 2 THEN cv END) AS c2,
                max(CASE WHEN ci = 3 THEN cv END) AS c3
         FROM chunks GROUP BY media_id)
       SELECT id_a, id_b,
              CAST(bit_count(xor(fa.c0, fb.c0)) + bit_count(xor(fa.c1, fb.c1))
                 + bit_count(xor(fa.c2, fb.c2)) + bit_count(xor(fa.c3, fb.c3))
                AS INT) AS hamming,
              CAST(CASE WHEN bit_count(xor(fa.c0, fb.c0))
                           + bit_count(xor(fa.c1, fb.c1))
                           + bit_count(xor(fa.c2, fb.c2))
                           + bit_count(xor(fa.c3, fb.c3)) <= 6
                        THEN 1 ELSE 0 END AS INT) AS is_neardup
       FROM cand
       JOIN fp fa ON fa.media_id = id_a
       JOIN fp fb ON fb.media_id = id_b
       ORDER BY id_a, id_b"""

  override val queries: Map[String, QueryFn] = Map(
    "q36_media_features" -> q36 _,
    "q37_frame_sample"   -> q37 _,
    "q373_audio_energy"  -> q373 _,
    "q374_image_phash"   -> q374 _)

  override val oracles: Map[String, String] = Map(
    "q36_media_features" -> q36Sql,
    "q37_frame_sample"   -> q37Sql,
    "q373_audio_energy"  -> q373Sql,
    "q374_image_phash"   -> q374Sql)
}
