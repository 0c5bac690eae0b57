package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-4 surface, part 18: embedding-space diagnostics expressed
  * relationally (posexplode to (id, dim, val) grain), plus word-level
  * text statistics.
  */
object Extras22 extends QueryPack {

  // --------------------------------------------------------------- q196
  /** Intra-cluster dispersion: squared distance of each embedding to
    * its label centroid. Centroids are an avg at (label, dim) grain;
    * distances re-join at the same grain, so the whole diagnostic is
    * two aggregates and one co-partitioned join — no UDFs, no
    * driver-side vectors, and the oracle spells the identical algebra
    * with range-indexed unnest. */
  private def q196(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("embeddings")
    val flat = e.select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("dim", "v")))
      .withColumn("v", col("v").cast("double"))
    val cent = flat.groupBy("label", "dim").agg(avg("v").as("c"))
    val dist = flat.join(cent, Seq("label", "dim"))
      .groupBy("vec_id", "label")
      .agg(sum((col("v") - col("c")) * (col("v") - col("c"))).as("d2"))
    dist.groupBy("label")
      .agg(count(lit(1)).as("n"),
           round(avg("d2"), 4).as("avg_d2"),
           round(max("d2"), 4).as("max_d2"))
      .orderBy("label")
  }

  private val q196Sql =
    """WITH flat AS (
         SELECT vec_id, label, t.dim, embedding[t.dim + 1]::DOUBLE AS v
         FROM embeddings, unnest(range(len(embedding))) AS t(dim)),
       cent AS (
         SELECT label, dim, avg(v) AS c FROM flat GROUP BY 1, 2),
       dist AS (
         SELECT f.vec_id, f.label, sum((f.v - c.c) * (f.v - c.c)) AS d2
         FROM flat f JOIN cent c ON f.label = c.label AND f.dim = c.dim
         GROUP BY 1, 2)
       SELECT label, count(*) AS n, round(avg(d2), 4) AS avg_d2,
              round(max(d2), 4) AS max_d2
       FROM dist GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q197
  /** Per-dimension feature statistics (mean / stddev / range) for the
    * first 8 dimensions — the embedding-drift monitoring table. One
    * posexplode, one (dim) aggregate. */
  private def q197(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("embeddings")
    e.select(posexplode(col("embedding")).as(Seq("dim", "v")))
      .filter(col("dim") < 8)
      .withColumn("v", col("v").cast("double"))
      .groupBy("dim")
      .agg(round(avg("v"), 6).as("mean"),
           round(stddev_samp(col("v")), 6).as("sd"),
           round(min("v"), 6).as("lo"),
           round(max("v"), 6).as("hi"))
      .orderBy("dim")
  }

  private val q197Sql =
    """WITH flat AS (
         SELECT t.dim, embedding[t.dim + 1]::DOUBLE AS v
         FROM embeddings, unnest(range(len(embedding))) AS t(dim))
       SELECT dim, round(avg(v), 6) AS mean, round(stddev_samp(v), 6) AS sd,
              round(min(v), 6) AS lo, round(max(v), 6) AS hi
       FROM flat WHERE dim < 8 GROUP BY 1 ORDER BY 1"""

  // --------------------------------------------------------------- q198
  /** L2-norm distribution per label in 0.5-wide buckets — the
    * normalization health check before cosine retrieval. The norm is
    * one aggregate() fold per row (map-side); the rollup is tiny. */
  private def q198(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("embeddings")
    e.select(col("label"),
        sqrt(expr(
          "aggregate(embedding, 0.0D, (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
          .as("norm"))
      .withColumn("bucket", floor(col("norm") / 0.5).cast("int"))
      .groupBy("label", "bucket")
      .agg(count(lit(1)).as("n"))
      .orderBy("label", "bucket")
  }

  private val q198Sql =
    """WITH norms AS (
         SELECT label,
                sqrt((SELECT sum(x.v::DOUBLE * x.v::DOUBLE)
                      FROM unnest(embedding) AS x(v))) AS norm
         FROM embeddings)
       SELECT label, CAST(floor(norm / 0.5) AS INT) AS bucket, count(*) AS n
       FROM norms GROUP BY 1, 2 ORDER BY 1, 2"""

  // --------------------------------------------------------------- q199
  /** Word-level text stats per language: average word length and words
    * per sentence, with both tokenizers shared verbatim with the
    * oracle. Everything reduces at (lang) after per-doc map-side
    * counts. */
  private def q199(s: SparkSession, dir: String): DataFrame = {
    val d = Tables(s, dir)("documents")
    val per = d.select(col("lang"),
        size(filter(split(lower(col("text")), "[^a-z]+"),
          w => length(w) > 0)).as("n_words"),
        expr("aggregate(filter(split(lower(text), '[^a-z]+'), " +
          "w -> length(w) > 0), 0, (acc, w) -> acc + length(w))")
          .as("n_chars"),
        size(filter(split(col("text"), "[.!?]+"),
          p => length(trim(p)) > 0)).as("n_sents"))
    per.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
           round(sum("n_chars") / sum("n_words").cast("double"), 6)
             .as("avg_word_len"),
           round(sum("n_words") / sum("n_sents").cast("double"), 6)
             .as("words_per_sentence"))
      .orderBy("lang")
  }

  private val q199Sql =
    """WITH per AS (
         SELECT lang,
                len(list_filter(string_split_regex(lower(text), '[^a-z]+'),
                    w -> len(w) > 0)) AS n_words,
                list_sum(list_transform(
                    list_filter(string_split_regex(lower(text), '[^a-z]+'),
                                w -> len(w) > 0),
                    w -> len(w))) AS n_chars,
                len(list_filter(string_split_regex(text, '[.!?]+'),
                    p -> len(trim(p)) > 0)) AS n_sents
         FROM documents)
       SELECT lang, count(*) AS n_docs,
              round(sum(n_chars) / sum(n_words)::DOUBLE, 6) AS avg_word_len,
              round(sum(n_words) / sum(n_sents)::DOUBLE, 6)
                AS words_per_sentence
       FROM per GROUP BY 1 ORDER BY 1"""

  override def queries: Map[String, QueryFn] = Map(
    "q196_centroid_dispersion" -> q196 _,
    "q197_dim_stats"           -> q197 _,
    "q198_norm_buckets"        -> q198 _,
    "q199_word_stats"          -> q199 _)

  override def oracles: Map[String, String] = Map(
    "q196_centroid_dispersion" -> q196Sql,
    "q197_dim_stats"           -> q197Sql,
    "q198_norm_buckets"        -> q198Sql,
    "q199_word_stats"          -> q199Sql)
}
