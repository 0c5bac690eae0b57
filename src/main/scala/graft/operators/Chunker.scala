package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Overlapping-window document chunking — the context-window prep stage
  * of long-context training and retrieval pipelines: each document's
  * token stream is cut into `chunkTokens`-token windows advancing by
  * `chunkTokens − overlap`, so consecutive chunks share `overlap`
  * tokens of context.
  *
  * Chunk-start rule (deterministic, no degenerate tails): starts are
  * 0, stride, 2·stride, … while start < n_tokens − overlap (plus start
  * 0 always) — a window that would consist ONLY of the previous
  * window's overlap region is never emitted, and every token is still
  * covered exactly by construction. Expressed as one
  * `sequence(0, greatest(n − overlap − 1, 0), stride)` per row.
  *
  * Pure map-side (tokenize → sequence → posexplode → slice): zero
  * shuffles at any corpus size; the natural downstream write is
  * `partitionBy` on the doc-hash prefix, which this stage preserves
  * because it never re-partitions.
  */
object Chunker {

  /** Output: (id, chunk_idx, start_tok, n_tokens, chunk_text). */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, overlap: Int): DataFrame = {
    require(chunkTokens > 0 && overlap >= 0 && overlap < chunkTokens,
      s"need 0 <= overlap < chunkTokens, got $overlap/$chunkTokens")
    val stride = chunkTokens - overlap
    val toks = TextFunctions.tokens(col(textCol))
    docs
      .select(col(idCol), toks.as("__t"))
      .select(col(idCol), col("__t"),
        posexplode(sequence(lit(0),
          greatest(size(col("__t")) - overlap - 1, lit(0)), lit(stride))))
      .withColumnRenamed("pos", "chunk_idx")
      .withColumnRenamed("col", "start_tok")
      .select(col(idCol), col("chunk_idx"), col("start_tok"),
        size(slice(col("__t"), col("start_tok") + 1, lit(chunkTokens)))
          .as("n_tokens"),
        concat_ws(" ", slice(col("__t"), col("start_tok") + 1, lit(chunkTokens)))
          .as("chunk_text"))
  }
}
