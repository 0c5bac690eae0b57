package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Inverse Cloze Task pair generation (Lee et al. 2019 "Latent Retrieval
  * for Weakly Supervised Open Domain QA"; the self-supervised positive
  * pairs behind ICT/Contriever-style retriever pretraining): one chunk
  * of a document is held out as the pseudo-QUERY, the rest of the
  * document is its positive CONTEXT — the model learns that a passage
  * and its surrounding document attract.
  *
  * Determinism discipline: the held-out chunk is `doc_id mod n_chunks`
  * — a fixed function of the row, standing in for the paper's random
  * draw, so both engines (and re-runs) pick the same chunk. Chunk
  * boundaries are [[Chunker]]'s integer token windows (overlap 0), so
  * the pair is reproducible bit-for-bit; the emitted columns are md5
  * digests + token counts, not the texts, to keep the pair table narrow
  * (the digests are the join keys a downstream trainer dedups/shards
  * on).
  *
  * Scale shape: chunking is map-side; the only shuffle is one hash-agg
  * keyed by doc id, whose per-group state is the document's own chunk
  * list — bounded by document length, never corpus-sized. No windows,
  * no collect.
  *
  * Reference scope: the capstone has no text ops; training-data
  * extension surface.
  */
object IctPairs {

  /** Output: (id, n_chunks, q_idx, query_md5, query_tokens, ctx_md5,
    * ctx_tokens). Single-chunk documents get an empty context
    * (md5 of "", 0 tokens) rather than dropping — the caller decides
    * whether pairs without context are usable.
    *
    * `idCol` must be an integral column: the held-out index is
    * `pmod(id, n_chunks)`, which is only defined (and only
    * deterministic across engines) on exact integers — a string id
    * would silently cast. Enforced up front; hash a non-numeric id to
    * a long (the md5-uniform family) before calling. */
  def pairs(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int): DataFrame = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val idType = docs.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(idType),
      s"IctPairs.pairs needs an integral id column; $idCol is $idType " +
        "(hash non-numeric ids to a long first)")
    val ch = Chunker.chunk(docs, idCol, textCol, chunkTokens, overlap = 0)
    ch.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
           sum(col("n_tokens")).as("total_tokens"),
           sort_array(collect_list(struct(col("chunk_idx"),
             col("n_tokens"), col("chunk_text")))).as("cs"))
      .withColumn("q_idx", pmod(col(idCol), col("n_chunks")))
      .withColumn("qc",
        element_at(col("cs"), (col("q_idx") + 1).cast("int")))
      .select(
        col(idCol), col("n_chunks"), col("q_idx"),
        md5(col("qc").getField("chunk_text")).as("query_md5"),
        col("qc").getField("n_tokens").cast("long").as("query_tokens"),
        md5(array_join(
          transform(
            filter(col("cs"), c => c.getField("chunk_idx") =!= col("q_idx")),
            c => c.getField("chunk_text")),
          " ")).as("ctx_md5"),
        (col("total_tokens") - col("qc").getField("n_tokens")).cast("long")
          .as("ctx_tokens"))
  }
}
