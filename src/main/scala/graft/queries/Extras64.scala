package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SubstringDedup

/** Round-8 pack, part 7: training-batch efficiency — the
  * length-sorted batching padding-waste table (q403).
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
    * arrival; (n_toks, doc_id) for sorted). The global row_number here
    * is the pedagogical form — at 100 TB batch ids come from a
    * range-partitioned sort + per-partition offset (the zipWithIndex
    * pattern), and the waste accounting itself stays ONE groupBy per
    * policy over (batch, len). All-integer math. */
  private def q403(s: SparkSession, dir: String): DataFrame = {
    val B = 8
    val lens = Tables(s, dir)("documents")
      .select(col("doc_id"),
        size(SubstringDedup.tokens(col("text"))).as("n_toks"))
      .filter(col("n_toks") >= 1)
    def policy(name: String, order: Seq[org.apache.spark.sql.Column]): DataFrame = {
      val w = Window.orderBy(order: _*)
      lens.withColumn("rn", row_number().over(w))
        .withColumn("batch", floor((col("rn") - 1) / B))
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
    s"""WITH lens AS (
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

  override def queries: Map[String, QueryFn] = Map(
    "q403_batch_padding" -> q403 _)

  override def oracles: Map[String, String] = Map(
    "q403_batch_padding" -> q403Sql)
}
