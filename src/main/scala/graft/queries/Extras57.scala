package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.SubstringDedup

/** Round-7 pack, part 4: cross-source language-model scoring — the
  * CCNet-style "filter by LM perplexity" signal as a driver-checked
  * matrix (q376).
  */
object Extras57 extends QueryPack {

  // --------------------------------------------------------------- q376
  /** Cross-source bigram-LM perplexity matrix: each source trains an
    * add-1-smoothed bigram model — P(w2|w1) = (c(w1,w2)+1)/(c(w1)+V),
    * V the shared corpus vocabulary — and every source's text is scored
    * under every model: avg negative log-prob per bigram occurrence,
    * and its exp (the perplexity). A source scores lowest under its own
    * model; high off-diagonal entries mark distribution mismatch — the
    * quantity CCNet-style curation thresholds on. Every PER-TERM
    * probability is an exact integer ratio, so both engines evaluate
    * identical doubles per bigram; the weighted SUM of those terms is
    * order-dependent in float (Spark's partial aggregation vs DuckDB's
    * single-threaded scan), and round(…, 6) is the DELIBERATE tolerance
    * absorbing that — the summands are O(10), the term count O(vocab²),
    * so accumulated error stays orders of magnitude below 1e-6.
    *
    * Scale shape: bigram counts are one (source, w1, w2) hash-agg; the
    * scoring join matches data-side counts to model-side counts on the
    * bigram key alone, producing each (model, data) pair in one
    * relational join — no per-pair scans, and at 100 TB the model
    * tables are the broadcast side (vocab-bounded, not corpus-bounded).
    * Missing bigrams/unigrams fall back to the smoothing floor via
    * left joins + coalesce, exactly as the math says. */
  private def q376(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables(s, dir)("documents")
      .select(col("source"), SubstringDedup.tokens(col("text")).as("t"))
      .filter(size(col("t")) >= 2)
    val bigrams = toks.select(col("source"), explode(
        transform(sequence(lit(0), size(col("t")) - 2),
          i => struct(element_at(col("t"), i + 1).as("w1"),
                      element_at(col("t"), i + 2).as("w2")))).as("b"))
      .select(col("source"), col("b.w1"), col("b.w2"))
    val bg = bigrams.groupBy("source", "w1", "w2")
      .agg(count(lit(1)).as("c2"))
    val ug = bigrams.groupBy("source", "w1").agg(count(lit(1)).as("c1"))
    val vocab = Tables(s, dir)("documents")
      .select(explode(SubstringDedup.tokens(col("text"))).as("w"))
      .agg(countDistinct(col("w")).as("v"))

    // data-side bigram occurrences × model-side counts, joined on the
    // bigram key; per (model, data) pair one weighted-average aggregate
    val data = bg.select(col("source").as("data_source"),
      col("w1"), col("w2"), col("c2").as("cb"))
    val modelBg = bg.select(col("source").as("model_source"),
      col("w1"), col("w2"), col("c2").as("ma"))
    val modelUg = ug.select(col("source").as("model_source"),
      col("w1"), col("c1").as("ua"))
    val sources = bg.select(col("source").as("model_source")).distinct()
    val scored = data
      .crossJoin(sources)
      .join(modelBg, Seq("model_source", "w1", "w2"), "left")
      .join(modelUg, Seq("model_source", "w1"), "left")
      .crossJoin(vocab)
      .select(col("model_source"), col("data_source"), col("cb"),
        (-log((coalesce(col("ma"), lit(0L)) + 1).cast("double") /
              (coalesce(col("ua"), lit(0L)) + col("v"))))
          .as("nll"))
    scored.groupBy("model_source", "data_source")
      .agg(sum("cb").cast("long").as("n_bigrams"),
        (sum(col("cb") * col("nll")) / sum("cb")).as("avg_nll"))
      .select(col("model_source"), col("data_source"), col("n_bigrams"),
        round(col("avg_nll"), 6).as("avg_nll"),
        round(exp(col("avg_nll")), 4).as("perplexity"))
      .orderBy("model_source", "data_source")
  }

  private val q376Sql =
    """WITH toks AS (
         SELECT source, list_filter(
                  regexp_split_to_array(lower(text), '[^a-z]+'),
                  w -> w <> '') AS t
         FROM documents),
       bigrams AS (
         SELECT source, t[i + 1] AS w1, t[i + 2] AS w2
         FROM toks, unnest(generate_series(0, len(t) - 2)) AS u(i)
         WHERE len(t) >= 2),
       bg AS (SELECT source, w1, w2, count(*) AS c2
              FROM bigrams GROUP BY source, w1, w2),
       ug AS (SELECT source, w1, count(*) AS c1
              FROM bigrams GROUP BY source, w1),
       vocab AS (
         SELECT count(DISTINCT w) AS v FROM (
           SELECT unnest(list_filter(
             regexp_split_to_array(lower(text), '[^a-z]+'),
             w -> w <> '')) AS w FROM documents)),
       sources AS (SELECT DISTINCT source AS model_source FROM bg),
       scored AS (
         SELECT s.model_source, d.source AS data_source, d.c2 AS cb,
                -ln(CAST(coalesce(mb.c2, 0) + 1 AS DOUBLE)
                    / (coalesce(mu.c1, 0) + vocab.v)) AS nll
         FROM bg d
         CROSS JOIN sources s
         LEFT JOIN bg mb ON mb.source = s.model_source
                        AND mb.w1 = d.w1 AND mb.w2 = d.w2
         LEFT JOIN ug mu ON mu.source = s.model_source AND mu.w1 = d.w1
         CROSS JOIN vocab)
       SELECT model_source, data_source,
              CAST(sum(cb) AS BIGINT) AS n_bigrams,
              round(sum(cb * nll) / sum(cb), 6) AS avg_nll,
              round(exp(sum(cb * nll) / sum(cb)), 4) AS perplexity
       FROM scored GROUP BY model_source, data_source
       ORDER BY model_source, data_source"""

  // --------------------------------------------------------------- q377
  /** Dedup-savings forecast by duplicate-cluster size: exact-dup
    * clusters (content md5) keep their min-doc_id member, and the
    * rollup answers the capacity question curation planning starts
    * from — how many bytes does exact dedup buy, and from which
    * cluster sizes? One fingerprint hash-agg (the q07 shuffle) + a
    * cluster-size regroup of the tiny cluster table; `min(struct)`
    * picks the kept member's size deterministically (DuckDB twin:
    * arg_min). */
  private def q377(s: SparkSession, dir: String): DataFrame = {
    val clusters = Tables(s, dir)("documents")
      .groupBy(md5(col("text")).as("fp"))
      .agg(count(lit(1)).as("sz"),
        sum(col("n_chars")).as("chars_total"),
        min(struct(col("doc_id"), col("n_chars")))
          .getField("n_chars").as("chars_kept"))
    clusters.groupBy(col("sz").cast("long").as("cluster_size"))
      .agg(count(lit(1)).cast("long").as("n_clusters"),
        sum("sz").cast("long").as("n_docs"),
        sum("chars_total").cast("long").as("chars_total"),
        sum(col("chars_total") - col("chars_kept")).cast("long")
          .as("chars_saved"))
      .withColumn("savings_share",
        round(col("chars_saved").cast("double") /
          sum("chars_total").over(
            org.apache.spark.sql.expressions.Window.partitionBy(lit(1))), 6))
      .orderBy("cluster_size")
  }

  private val q377Sql =
    """WITH clusters AS (
         SELECT md5(text) AS fp, count(*) AS sz,
                sum(n_chars) AS chars_total,
                arg_min(n_chars, doc_id) AS chars_kept
         FROM documents GROUP BY md5(text)),
       g AS (
         SELECT CAST(sz AS BIGINT) AS cluster_size,
                CAST(count(*) AS BIGINT) AS n_clusters,
                CAST(sum(sz) AS BIGINT) AS n_docs,
                CAST(sum(chars_total) AS BIGINT) AS chars_total,
                CAST(sum(chars_total - chars_kept) AS BIGINT) AS chars_saved
         FROM clusters GROUP BY sz)
       SELECT cluster_size, n_clusters, n_docs, chars_total, chars_saved,
              round(CAST(chars_saved AS DOUBLE)
                    / sum(chars_total) OVER (), 6) AS savings_share
       FROM g ORDER BY cluster_size"""

  // --------------------------------------------------------------- q378
  /** TEMPORAL split-leakage audit — the time-boundary companion of
    * q290's hash-split audit: with a fixed train/test cut at
    * 1996-01-01, every user whose events span the boundary leaks
    * future behavior into training features. One (user, side)
    * aggregate; the leak set is the both-sides intersection, reported
    * per event_type with its share of test-side volume. */
  private def q378(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir)("events")
      .select(col("user_id"), col("event_type"),
        (col("ts") < lit("1996-01-01").cast("timestamp")).as("is_train"))
    val sides = e.groupBy("user_id")
      .agg(max(when(col("is_train"), 1).otherwise(0)).as("has_train"),
           max(when(!col("is_train"), 1).otherwise(0)).as("has_test"))
    val leaky = sides.filter(col("has_train") === 1 && col("has_test") === 1)
      .select("user_id")
    e.filter(!col("is_train"))
      .join(leaky.withColumn("leak", lit(1)), Seq("user_id"), "left")
      .groupBy("event_type")
      .agg(count(lit(1)).cast("long").as("n_test_events"),
        sum(coalesce(col("leak"), lit(0))).cast("long")
          .as("n_leaky_events"),
        countDistinct(when(col("leak") === 1, col("user_id")))
          .cast("long").as("n_leaky_users"))
      .withColumn("leak_share",
        round(col("n_leaky_events").cast("double") / col("n_test_events"), 6))
      .orderBy("event_type")
  }

  private val q378Sql =
    """WITH e AS (
         SELECT user_id, event_type,
                ts < TIMESTAMP '1996-01-01' AS is_train
         FROM events),
       sides AS (
         SELECT user_id,
                max(CASE WHEN is_train THEN 1 ELSE 0 END) AS has_train,
                max(CASE WHEN NOT is_train THEN 1 ELSE 0 END) AS has_test
         FROM e GROUP BY user_id),
       leaky AS (
         SELECT user_id, 1 AS leak FROM sides
         WHERE has_train = 1 AND has_test = 1)
       SELECT event_type,
              CAST(count(*) AS BIGINT) AS n_test_events,
              CAST(sum(coalesce(leak, 0)) AS BIGINT) AS n_leaky_events,
              CAST(count(DISTINCT CASE WHEN leak = 1 THEN e.user_id END)
                AS BIGINT) AS n_leaky_users,
              round(CAST(sum(coalesce(leak, 0)) AS DOUBLE) / count(*), 6)
                AS leak_share
       FROM e LEFT JOIN leaky ON e.user_id = leaky.user_id
       WHERE NOT is_train
       GROUP BY event_type ORDER BY event_type"""

  override def queries: Map[String, QueryFn] = Map(
    "q376_lm_crossppl"    -> q376 _,
    "q377_dedup_savings"  -> q377 _,
    "q378_temporal_leak"  -> q378 _)

  override def oracles: Map[String, String] = Map(
    "q376_lm_crossppl"    -> q376Sql,
    "q377_dedup_savings"  -> q377Sql,
    "q378_temporal_leak"  -> q378Sql)
}
