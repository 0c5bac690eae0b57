package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SubstringDedup

/** Round-8 pack, part 7: training-batch efficiency and pretraining
  * prep — the length-sorted batching padding-waste table (q403), the
  * MRR retrieval-eval table (q404), and the deterministic
  * span-corruption planner (q405).
  */
object Extras64 extends QueryPack {

  // --------------------------------------------------------------- q403
  /** PADDING-waste accounting for fixed-size batches (B=8): every
    * sequence in a batch pads to the batch max, so padded = Σ_batches
    * max_len·B vs real = Σ len — compared between ARRIVAL-order
    * batching and LENGTH-SORTED batching (the dynamic-batching /
    * bucketing argument in one table: sorting collapses the per-batch
    * length spread, so utilization jumps). Batch assignment is
    * floor((rank−1)/B) over a deterministic total order (doc_id for
    * arrival; (n_toks, doc_id) for sorted). Batch ids come from
    * [[graft.operators.RowIndexer]] — range-partitioned sort +
    * per-partition offset (batch = idx DIV B), never a single-task
    * row_number window — and the waste accounting itself stays ONE
    * groupBy per policy over (batch, len). All-integer math. */
  private def q403(s: SparkSession, dir: String): DataFrame = {
    import graft.operators.RowIndexer
    val B = 8
    val lens = Tables(s, dir)("documents")
      .select(col("doc_id"),
        size(SubstringDedup.tokens(col("text"))).as("n_toks"))
      .filter(col("n_toks") >= 1)
    def policy(name: String, order: Seq[org.apache.spark.sql.Column]): DataFrame = {
      RowIndexer.stableIndex(lens, order)
        .withColumn("batch", expr(s"idx DIV $B"))
        .groupBy("batch")
        .agg(count(lit(1)).as("bsz"), max("n_toks").as("mx"),
          sum("n_toks").as("real"))
        .agg(count(lit(1)).cast("long").as("n_batches"),
          sum("real").cast("long").as("real_tokens"),
          sum(col("mx") * col("bsz")).cast("long").as("padded_tokens"))
        .select(lit(name).as("policy"), col("n_batches"), col("real_tokens"),
          col("padded_tokens"),
          (col("padded_tokens") - col("real_tokens")).as("waste_tokens"),
          round(col("real_tokens").cast("double") / col("padded_tokens"), 6)
            .as("utilization"))
    }
    policy("arrival", Seq(col("doc_id")))
      .unionAll(policy("sorted", Seq(col("n_toks"), col("doc_id"))))
      .orderBy("policy")
  }

  private val q403Sql = {
    val B = 8
    def policySql(name: String, order: String) =
      s"""SELECT '$name' AS policy,
             CAST(count(*) AS BIGINT) AS n_batches,
             CAST(sum(real) AS BIGINT) AS real_tokens,
             CAST(sum(mx * bsz) AS BIGINT) AS padded_tokens,
             CAST(sum(mx * bsz) - sum(real) AS BIGINT) AS waste_tokens,
             round(CAST(sum(real) AS DOUBLE) / sum(mx * bsz), 6)
               AS utilization
           FROM (
             SELECT (rn - 1) // $B AS batch, count(*) AS bsz,
                    max(n_toks) AS mx, sum(n_toks) AS real
             FROM (
               SELECT doc_id, n_toks,
                      row_number() OVER (ORDER BY $order) AS rn
               FROM lens)
             GROUP BY 1)"""
    s"""WITH lens AS MATERIALIZED (
         SELECT doc_id,
                len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '')) AS n_toks
         FROM documents
         WHERE len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                 w -> w <> '')) >= 1)
       ${policySql("arrival", "doc_id")}
       UNION ALL
       ${policySql("sorted", "n_toks, doc_id")}
       ORDER BY policy"""
  }

  // --------------------------------------------------------------- q404
  /** MRR retrieval evaluation — the last rung of the eval ladder next
    * to recall@10 (q390) and NDCG@10 (q296): per query vector, the
    * rank of the FIRST same-label neighbor in the exact cosine
    * ranking, and its reciprocal. Ranks are decided on raw IEEE
    * cosines with id tie-break (the q400 discipline); the reciprocal
    * is one exact division, rounded only in the projection. 100 TB
    * shape: queries broadcast, one scored join, one partitioned
    * window, one min-aggregate. */
  private def q404(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val emb = Tables(s, dir)("embeddings")
    val q = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("label").as("q_label"),
        col("embedding").as("qv"))
    val scored = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("q_label"),
        col("vec_id").as("cand_id"), col("label").as("c_label"),
        VectorFunctions.cosine(col("qv"), col("embedding")).as("c"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("c").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("c_label") === col("q_label"))
      .groupBy(col("query_id"), col("q_label").as("label"))
      .agg(min("rk").cast("long").as("first_rel_rank"))
      .withColumn("rr", round(lit(1.0) / col("first_rel_rank"), 6))
      .orderBy("query_id")
  }

  private val q404Sql = {
    import OracleVec.{dotSql, normSql}
    s"""WITH q AS (
         SELECT vec_id AS query_id, label AS q_label, embedding AS qv
         FROM embeddings WHERE vec_id < 10),
       scored AS (
         SELECT q.query_id, q.q_label, e.vec_id AS cand_id,
                e.label AS c_label,
           CASE WHEN ${normSql("q.qv")} * ${normSql("e.embedding")} = 0
                THEN 0.0
                ELSE ${dotSql("q.qv", "e.embedding")} /
                  (${normSql("q.qv")} * ${normSql("e.embedding")})
           END AS c
         FROM q JOIN embeddings e ON e.vec_id <> q.query_id),
       ranked AS (
         SELECT query_id, q_label, c_label,
                row_number() OVER (PARTITION BY query_id
                  ORDER BY c DESC, cand_id) AS rk
         FROM scored)
       SELECT query_id, q_label AS label,
              CAST(min(rk) AS BIGINT) AS first_rel_rank,
              round(1.0 / min(rk), 6) AS rr
       FROM ranked WHERE c_label = q_label
       GROUP BY query_id, q_label ORDER BY query_id"""
  }

  // --------------------------------------------------------------- q405
  /** Deterministic SPAN-CORRUPTION planner (the T5 denoising schedule
    * made replayable): each full 20-token block of a document gets ONE
    * 3-token mask span whose offset is md5(doc_id,block) mod 18 — a
    * 15% mask rate with non-overlapping spans by construction, and the
    * exact same schedule on every run/engine (the property an
    * augmentation pipeline needs for resumable training). Pure
    * map-side: blocks posexplode from a sequence, the span start is
    * row-local hash math, and the per-doc rollup is one aggregate. */
  private def q405(s: SparkSession, dir: String): DataFrame = {
    val B = 20; val Span = 3
    val d = Tables(s, dir)("documents")
      .select(col("doc_id"),
        size(SubstringDedup.tokens(col("text"))).as("n_toks"))
      .filter(col("n_toks") >= B)
    val blocks = d.select(col("doc_id"), col("n_toks"),
      explode(sequence(lit(0), (col("n_toks") / B).cast("int") - 1))
        .as("b"))
    val h = conv(substring(md5(encode(
      concat(col("doc_id").cast("string"), lit("_"), col("b").cast("string")),
      "UTF-8")), 1, 8), 16, 10).cast("long")
    blocks
      .withColumn("start", col("b") * B + h % (B - Span + 1))
      .groupBy("doc_id")
      .agg(max("n_toks").cast("long").as("n_toks"),
        count(lit(1)).cast("long").as("n_spans"),
        (count(lit(1)) * Span).cast("long").as("masked_tokens"),
        min("start").cast("long").as("min_start"),
        max("start").cast("long").as("max_start"))
      .withColumn("mask_ratio",
        round(col("masked_tokens").cast("double") / col("n_toks"), 6))
      .orderBy("doc_id")
  }

  private val q405Sql = {
    val B = 20; val Span = 3
    s"""WITH lens AS (
         SELECT doc_id,
                len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '')) AS n_toks
         FROM documents),
       d AS (SELECT doc_id, n_toks FROM lens WHERE n_toks >= $B),
       blocks AS (
         SELECT doc_id, n_toks, u.b,
                u.b * $B +
                  ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '_' ||
                     CAST(u.b AS VARCHAR)), 1, 8))::BIGINT %
                  ${B - Span + 1} AS start
         FROM d, unnest(generate_series(0, n_toks // $B - 1)) AS u(b))
       SELECT doc_id,
              CAST(max(n_toks) AS BIGINT) AS n_toks,
              CAST(count(*) AS BIGINT) AS n_spans,
              CAST(count(*) * $Span AS BIGINT) AS masked_tokens,
              CAST(min(start) AS BIGINT) AS min_start,
              CAST(max(start) AS BIGINT) AS max_start,
              round(count(*) * $Span / CAST(max(n_toks) AS DOUBLE), 6)
                AS mask_ratio
       FROM blocks GROUP BY doc_id ORDER BY doc_id"""
  }

  override def queries: Map[String, QueryFn] = Map(
    "q403_batch_padding" -> q403 _,
    "q404_mrr" -> q404 _,
    "q405_span_corruption" -> q405 _)

  override def oracles: Map[String, String] = Map(
    "q403_batch_padding" -> q403Sql,
    "q404_mrr" -> q404Sql,
    "q405_span_corruption" -> q405Sql)
}
