package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, decoded/feature-extracted inside
  * `mapPartitions` over a typed Dataset.
  *
  * The DECODE step is a deterministic stub — no codec libraries exist in
  * this environment — but everything Spark-side is real and is the part
  * that matters at 100 TB:
  *   - schema: (media_id, kind, content: binary, meta struct);
  *   - batch shape: the decoder is instantiated ONCE PER PARTITION
  *     (the expensive-model-init pattern; a per-row UDF would re-init
  *     per call or capture non-serializable state);
  *   - partitioning: media rows hash-partition by id; feature extraction
  *     is narrow (no shuffle), so it pipelines with the scan;
  *   - the feature schema comes back as a typed Dataset so downstream
  *     relational ops (groupBy kind, joins to labels) stay columnar.
  *
  * Swapping [[StubDecoder]] for a real JNI/FFMPEG-backed decoder changes
  * no plan shape — only the partition-local function body.
  */
object Multimodal {

  /** Decoded per-media features (a real decoder would add real values;
    * the stub derives them deterministically from the bytes). */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, n_frames: Int, checksum: Long)

  /** Decoder contract: bytes → features. Implementations must be
    * serializable-free at the driver: construct INSIDE mapPartitions. */
  trait Decoder {
    def decode(mediaId: Long, kind: String, content: Array[Byte]): MediaFeatures
  }

  /** Deterministic fake decode: features are pure functions of the
    * payload, so results are stable and oracle-checkable. A real decoder
    * replaces exactly this class. */
  final class StubDecoder extends Decoder {
    def decode(mediaId: Long, kind: String, content: Array[Byte]): MediaFeatures = {
      val len = content.length
      // touch every byte (simulates real decode cost + proves the
      // binary column round-trips intact)
      var sum = 0L
      var i = 0
      while (i < len) { sum += (content(i) & 0xFF).toLong * (i + 1); i += 1 }
      MediaFeatures(
        media_id = mediaId, kind = kind, n_bytes = len,
        width  = 64 + len % 512,
        height = 64 + (len * 7) % 512,
        n_frames = if (kind == "video") 1 + len % 24 else 1,
        checksum = sum)
    }
  }

  /** Synthesize a media table from `documents`: UTF-8 payload bytes as
    * the opaque binary column, kind assigned round-robin. Deterministic,
    * so every downstream op is golden-testable. */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
                 (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("content"),
      struct(col("source").as("origin"), col("lang").as("language"))
        .as("meta"))

  /** Partition-local decode → typed feature Dataset. */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        val decoder = new StubDecoder // once per partition, not per row
        rows.map { case (id, kind, bytes) => decoder.decode(id, kind, bytes) }
      }
  }

  /** "Resize": emit a derived payload (here: truncation to maxBytes) —
    * the binary-in/binary-out transform shape used by thumbnailing /
    * re-encoding stages. */
  def resizePayload(media: DataFrame, maxBytes: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.map { case (id, kind, bytes) =>
          (id, kind, bytes.take(maxBytes), bytes.length, math.min(bytes.length, maxBytes))
        }
      }
      .toDF("media_id", "kind", "content", "orig_bytes", "new_bytes")
  }

  /** Windowed audio-energy profile for audio rows: the payload is read
    * as unsigned 8-bit PCM, cut into fixed windows, and each window
    * reports its exact integer energy Σ(sample−128)² — the windowed-
    * decode shape of VAD / loudness segmentation, all partition-local
    * (one decoder pass per partition, no shuffle until the caller
    * aggregates). Integer energies make the stub bit-exact for the
    * oracle; a real PCM decoder replaces only the byte interpretation. */
  def audioEnergy(media: DataFrame, window: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2 == "audio").flatMap { case (id, _, bytes) =>
          bytes.grouped(window).zipWithIndex.map { case (chunk, ix) =>
            var s = 0L
            chunk.foreach { b =>
              val v = (b & 0xFF) - 128; s += v.toLong * v
            }
            (id, ix, chunk.length, s)
          }
        }
      }
      .toDF("media_id", "window_idx", "n_samples", "sum_sq")
  }

  /** aHash-style perceptual fingerprint for image rows: the payload is
    * cut into 64 equal byte blocks and bit b lights when block b's mean
    * exceeds the global mean — compared in EXACT integer cross-products
    * (block_sum·len > total_sum·block_len), so no float division can
    * wobble a bit. Returned as four 16-bit chunks (c0..c3) rather than
    * one 64-bit word: the chunks ARE the SimHash-style LSH band keys
    * for near-dup blocking, and staying at 16 bits keeps every value
    * positive in any engine. Partition-local decode; a real DCT pHash
    * replaces only the block-mean step. */
  def imageHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "content").as[(Long, String, Array[Byte])]
      .mapPartitions { rows =>
        rows.filter(_._2 == "image").map { case (id, _, bytes) =>
          val len = bytes.length
          val bsum = new Array[Long](64)
          val blen = new Array[Long](64)
          var b = 0
          while (b < 64) {
            // Long math: Int `b * len` overflows past ~33 MB payloads,
            // and the q374 oracle's BIGINT math would diverge exactly
            // in the large-payload regime this path exists for
            val lo = (b.toLong * len / 64).toInt
            val hi = ((b + 1).toLong * len / 64).toInt
            var j = lo; var s = 0L
            while (j < hi) { s += (bytes(j) & 0xFF); j += 1 }
            bsum(b) = s; blen(b) = hi - lo; b += 1
          }
          val tsum = bsum.sum
          val chunks = new Array[Int](4)
          b = 0
          while (b < 64) {
            if (bsum(b) * len > tsum * blen(b))
              chunks(b / 16) |= 1 << (b % 16)
            b += 1
          }
          (id, chunks(0), chunks(1), chunks(2), chunks(3))
        }
      }
      .toDF("media_id", "c0", "c1", "c2", "c3")
  }

  /** Image near-dup candidates over [[imageHash]] fingerprints: the
    * four 16-bit chunks are the LSH band keys (images sharing any
    * chunk pair up), each candidate scored with its exact Hamming
    * distance. `maxBucket` applies the [[graft.operators.Dedup]]
    * hot-bucket cap — a corpus of near-black thumbnails can drop
    * thousands of images into one chunk bucket, and the B² candidate
    * pairs from that bucket are the same quadratic the text LSH paths
    * guard against; over-cap buckets are skipped deterministically
    * (flooded fingerprints are boilerplate imagery by definition, and
    * still have three other chunks to pair through). */
  def imageNearDup(media: DataFrame, maxHamming: Int = 6,
                   maxBucket: Int = Int.MaxValue): DataFrame = {
    val fp = imageHash(media)
    val bands = graft.operators.Dedup.dropHotBuckets(
      fp.select(col("media_id"),
        posexplode(array(col("c0"), col("c1"), col("c2"), col("c3"))))
        .withColumnRenamed("pos", "ci").withColumnRenamed("col", "cv"),
      Seq("ci", "cv"), maxBucket)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.ci") === col("b.ci") && col("a.cv") === col("b.cv") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"))
      .distinct()
    val ham = (0 to 3).map(i =>
      bit_count(col(s"fa.c$i").bitwiseXOR(col(s"fb.c$i"))))
      .reduce(_ + _)
    cand
      .join(fp.as("fa"), col("fa.media_id") === col("id_a"))
      .join(fp.as("fb"), col("fb.media_id") === col("id_b"))
      .select(col("id_a"), col("id_b"), ham.cast("int").as("hamming"))
      .withColumn("is_neardup", (col("hamming") <= maxHamming).cast("int"))
  }

  /** Frame sampling stub for video rows: one output row per sampled
    * frame index (every `stride`th of n_frames) — the explode shape a
    * real frame extractor produces. */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.filter(_.kind == "video")
      .flatMap(f => (0 until f.n_frames by stride).map(ix => (f.media_id, ix, f.n_frames)))
      .toDF("media_id", "frame_idx", "n_frames")
  }
}
